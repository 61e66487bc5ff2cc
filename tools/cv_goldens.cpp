// Golden-fixture generator for cross-validating the JAX geometry stack
// against the reference's actual frontend/solvers (round-3 verdict,
// missing #3).  The reference's tracking frontend is cv::ORB
// (src/frame.cc:75-79) and its pose solvers are cv::solvePnPRansac
// (pnpmatch.cc:227: iterations=100, reproj=8.0, conf=0.99) and
// cv::findFundamentalMat (pnpmatch.cc:336) — this tool runs those exact
// calls on committed inputs and dumps their outputs, which
// tests/test_cv_goldens.py then holds the JAX implementations to.
//
// Modes:
//   cv_goldens orb  <image> <out.txt>          cv::ORB keypoints (x y resp octave angle)
//   cv_goldens pnp  <corr.txt> <out.txt>       solvePnPRansac pose + inliers
//   cv_goldens fmat <pairs.txt> <out.txt>      findFundamentalMat(RANSAC) F + inliers
//
// corr.txt:  line 1 "fx fy cx cy", then rows "X Y Z u v"
// pairs.txt: rows "u1 v1 u2 v2"

#include <cstdio>
#include <vector>
#include <opencv2/opencv.hpp>

static int run_orb(const char* img_path, const char* out_path) {
    cv::Mat img = cv::imread(img_path, cv::IMREAD_GRAYSCALE);
    if (img.empty()) { std::fprintf(stderr, "cannot read %s\n", img_path); return 1; }
    // reference frame ctor: cv::ORB::create() defaults = 500 features,
    // scale 1.2, 8 levels (frame.cc:75)
    cv::Ptr<cv::ORB> orb = cv::ORB::create();
    std::vector<cv::KeyPoint> kps;
    cv::Mat desc;
    orb->detectAndCompute(img, cv::noArray(), kps, desc);
    FILE* f = std::fopen(out_path, "w");
    std::fprintf(f, "%zu\n", kps.size());
    for (const auto& k : kps)
        std::fprintf(f, "%.3f %.3f %.3f %d %.2f\n",
                     k.pt.x, k.pt.y, k.response, k.octave, k.angle);
    std::fclose(f);
    std::printf("orb: %zu keypoints -> %s\n", kps.size(), out_path);
    return 0;
}

static int run_pnp(const char* in_path, const char* out_path) {
    FILE* f = std::fopen(in_path, "r");
    if (!f) { std::fprintf(stderr, "cannot read %s\n", in_path); return 1; }
    double fx, fy, cx, cy;
    if (std::fscanf(f, "%lf %lf %lf %lf", &fx, &fy, &cx, &cy) != 4) return 1;
    std::vector<cv::Point3f> X;
    std::vector<cv::Point2f> x;
    double a, b, c, u, v;
    while (std::fscanf(f, "%lf %lf %lf %lf %lf", &a, &b, &c, &u, &v) == 5) {
        X.emplace_back((float)a, (float)b, (float)c);
        x.emplace_back((float)u, (float)v);
    }
    std::fclose(f);
    cv::Mat K = (cv::Mat_<double>(3, 3) << fx, 0, cx, 0, fy, cy, 0, 0, 1);
    cv::Mat rvec, tvec, inliers;
    // the reference's exact call (pnpmatch.cc:227)
    cv::solvePnPRansac(X, x, K, cv::Mat(), rvec, tvec, false, 100, 8.0, 0.99, inliers);
    cv::Mat R;
    cv::Rodrigues(rvec, R);
    FILE* o = std::fopen(out_path, "w");
    for (int i = 0; i < 3; i++)
        std::fprintf(o, "%.9f %.9f %.9f\n",
                     R.at<double>(i, 0), R.at<double>(i, 1), R.at<double>(i, 2));
    std::fprintf(o, "%.9f %.9f %.9f\n",
                 tvec.at<double>(0), tvec.at<double>(1), tvec.at<double>(2));
    std::fprintf(o, "%d %zu\n", inliers.rows, X.size());
    std::fclose(o);
    std::printf("pnp: %d/%zu inliers -> %s\n", inliers.rows, X.size(), out_path);
    return 0;
}

static int run_fmat(const char* in_path, const char* out_path) {
    FILE* f = std::fopen(in_path, "r");
    if (!f) { std::fprintf(stderr, "cannot read %s\n", in_path); return 1; }
    std::vector<cv::Point2f> p1, p2;
    double u1, v1, u2, v2;
    while (std::fscanf(f, "%lf %lf %lf %lf", &u1, &v1, &u2, &v2) == 4) {
        p1.emplace_back((float)u1, (float)v1);
        p2.emplace_back((float)u2, (float)v2);
    }
    std::fclose(f);
    cv::Mat mask;
    // the reference's moving-object F (pnpmatch.cc:336 uses the RANSAC
    // default: 3.0 px, 0.99)
    cv::Mat F = cv::findFundamentalMat(p1, p2, cv::FM_RANSAC, 3.0, 0.99, mask);
    FILE* o = std::fopen(out_path, "w");
    for (int i = 0; i < 3; i++)
        std::fprintf(o, "%.9e %.9e %.9e\n",
                     F.at<double>(i, 0), F.at<double>(i, 1), F.at<double>(i, 2));
    std::fprintf(o, "%d %zu\n", cv::countNonZero(mask), p1.size());
    std::fclose(o);
    std::printf("fmat: %d/%zu inliers -> %s\n", cv::countNonZero(mask), p1.size(), out_path);
    return 0;
}

int main(int argc, char** argv) {
    if (argc != 4) {
        std::fprintf(stderr, "usage: %s orb|pnp|fmat <in> <out>\n", argv[0]);
        return 2;
    }
    std::string mode = argv[1];
    if (mode == "orb") return run_orb(argv[2], argv[3]);
    if (mode == "pnp") return run_pnp(argv[2], argv[3]);
    if (mode == "fmat") return run_fmat(argv[2], argv[3]);
    std::fprintf(stderr, "unknown mode %s\n", mode.c_str());
    return 2;
}
