// Golden-mask oracle for the USTC experimental subsenseShrink (SuBSENSE +
// Lab shrink-box overlay): compiles the reference's own sources in place —
// ustc_src/bgs_subsense_optical_flow/qt_cmake_bgs_sof/subsenseshrink.cpp
// (patched copy prepared by tests/test_golden_shrink.py: OpenCV 2.x->4.x
// mechanical rewrites only) + the ustc_src/pl LBSP family it subclasses —
// and dumps per-frame foreground masks as PNGs.
//
// Call sequence per the reference's own driver (shrink.cpp:69-90):
// initialize(frame0, all-on ROI), then operator()(frame, mask, override)
// per frame. The driver's bootstrap override double(k<=100) is specific to
// its CDnet runs; we pass 0 (per-pixel learning rates) to match how the
// rebuild — like the plain SuBSENSE oracle — drives the model.
//
// Usage: subshrink_oracle <video> <out_dir> <max_frames>
#include "cv4_shim.h"

#include <opencv2/imgcodecs.hpp>
#include <opencv2/videoio.hpp>
#include "subsenseshrink.h"
#include <cstdio>
#include <string>

// OpenCV 4.x made BackgroundSubtractor::apply pure virtual (2.x used
// operator()); same trampoline as subsense_oracle.cpp.
struct SubShrinkImpl : subsenseShrink {
  void apply(cv::InputArray i, cv::OutputArray o, double lr) CV_OVERRIDE { (*this)(i, o, lr); }
};

int main(int argc, char** argv) {
  if (argc < 4) { fprintf(stderr, "usage: subshrink_oracle <video> <out> <maxf>\n"); return 1; }
  std::string src = argv[1], out = argv[2];
  int maxf = atoi(argv[3]);
  cv::VideoCapture cap(src);
  if (!cap.isOpened()) { fprintf(stderr, "bad src\n"); return 1; }
  SubShrinkImpl bgs;
  cv::Mat frame, mask;
  bool first = true;
  for (int i = 0; i < maxf; ++i) {
    if (!cap.read(frame)) break;
    if (first) {
      cv::Mat roi(frame.size(), CV_8UC1, cv::Scalar_<uchar>(255));
      bgs.initialize(frame, roi);
      first = false;
    }
    bgs(frame, mask, 0);
    char buf[512];
    snprintf(buf, sizeof buf, "%s/mask_%04d.png", out.c_str(), i);
    cv::imwrite(buf, mask);
  }
  return 0;
}
