// CPU timing of the reference's per-frame frontend pattern, for BASELINE.md:
//   - cv::ORB::create() default detectAndCompute (frame.cc:75-79) — the
//     reference runs this once in the frame ctor and AGAIN on both frames
//     inside poseEstimation2D_2D (pnpmatch.cc:268-269), i.e. 3 detections
//     per tracked frame
//   - brute-force Hamming matching: the last-frame scan (pnpmatch.cc:61-95)
//     plus the 4-frame local-map scan (pnpmatch.cc:160-199), modeled as
//     500x500 and 500x2000 full scans with the reference's SWAR popcount
//     (pnpmatch.cc:14-30)
//
// Usage: ref_frontend_bench <left.pgm> [reps]
// Prints per-stage medians in ms.

#include <algorithm>
#include <chrono>
#include <cstdio>
#include <vector>
#include <opencv2/opencv.hpp>

static int desc_distance(const uchar* a, const uchar* b) {
    // classic SWAR popcount over 256 bits, as pnpmatch.cc:14-30
    int dist = 0;
    const int* pa = (const int*)a;
    const int* pb = (const int*)b;
    for (int i = 0; i < 8; i++, pa++, pb++) {
        unsigned int v = *pa ^ *pb;
        v = v - ((v >> 1) & 0x55555555);
        v = (v & 0x33333333) + ((v >> 2) & 0x33333333);
        dist += (((v + (v >> 4)) & 0xF0F0F0F) * 0x1010101) >> 24;
    }
    return dist;
}

static double median_ms(std::vector<double>& v) {
    std::sort(v.begin(), v.end());
    return v[v.size() / 2];
}

int main(int argc, char** argv) {
    if (argc < 2) { std::fprintf(stderr, "usage: %s left [reps]\n", argv[0]); return 2; }
    cv::Mat img = cv::imread(argv[1], cv::IMREAD_GRAYSCALE);
    if (img.empty()) { std::fprintf(stderr, "bad image\n"); return 1; }
    int reps = argc > 2 ? std::atoi(argv[2]) : 9;

    auto orb = cv::ORB::create();  // defaults: 500 features (frame.cc:75)
    std::vector<cv::KeyPoint> kps;
    cv::Mat desc;
    std::vector<double> t_orb, t_match;
    for (int r = 0; r < reps; r++) {
        auto t0 = std::chrono::steady_clock::now();
        orb->detectAndCompute(img, cv::noArray(), kps, desc);
        auto t1 = std::chrono::steady_clock::now();
        t_orb.push_back(std::chrono::duration<double, std::milli>(t1 - t0).count());
    }

    // matching scans: last-frame (N x N) + local map (N x 4N), serial loops
    // exactly as the reference's per-mappoint inner scans
    int N = desc.rows;
    cv::Mat map_desc;
    for (int i = 0; i < 4; i++) map_desc.push_back(desc);
    volatile int sink = 0;
    for (int r = 0; r < reps; r++) {
        auto t0 = std::chrono::steady_clock::now();
        for (int i = 0; i < N; i++) {
            int best = 1 << 30;
            for (int j = 0; j < N; j++)
                best = std::min(best, desc_distance(desc.ptr(i), desc.ptr(j)));
            for (int j = 0; j < map_desc.rows; j++)
                best = std::min(best, desc_distance(desc.ptr(i), map_desc.ptr(j)));
            sink += best;
        }
        auto t1 = std::chrono::steady_clock::now();
        t_match.push_back(std::chrono::duration<double, std::milli>(t1 - t0).count());
    }

    std::printf("orb_detect_describe_ms %.2f  (x3 per frame: %.2f)\n",
                median_ms(t_orb), 3 * median_ms(t_orb));
    std::printf("hamming_scans_ms %.2f  (N=%d)\n", median_ms(t_match), N);
    return 0;
}
