// Golden-mask oracle for the USTC experimental shrinkBGS: compiles the
// reference's own ustc_src/shrinkBGS sources (patched copies prepared by
// tests/test_golden_shrink.py — OpenCV 2.x->4.x mechanical rewrites only;
// the reference tree is never modified or vendored) and dumps per-frame raw
// foreground masks as PNGs.
//
// Reference call sequence: shrinkBGS is an IBGS (shrinkbgs.h:25-29) driven
// as process(frame, out, bg) per frame (ustc_src/shrinkBGS/main.cpp:43-66);
// frame 0 runs loadConfig+init (model refresh from gaussian-weighted nearby
// positions) and emits an empty mask, later frames emit the raw consensus
// mask (shrinkbgs.cpp:95).
//
// Usage: shrink_oracle <video> <out_dir> <max_frames>
#include "cv4_shim.h"

#include <opencv2/imgcodecs.hpp>
#include <opencv2/videoio.hpp>
#include "shrinkbgs.h"
#include <cstdio>
#include <string>

int main(int argc, char** argv) {
  if (argc < 4) { fprintf(stderr, "usage: shrink_oracle <video> <out> <maxf>\n"); return 1; }
  std::string src = argv[1], out = argv[2];
  int maxf = atoi(argv[3]);
  cv::VideoCapture cap(src);
  if (!cap.isOpened()) { fprintf(stderr, "bad src\n"); return 1; }
  shrinkBGS bgs;
  cv::Mat frame, mask, bg;
  for (int i = 0; i < maxf; ++i) {
    if (!cap.read(frame)) break;
    bgs.process(frame, mask, bg);
    char buf[512];
    snprintf(buf, sizeof buf, "%s/mask_%04d.png", out.c_str(), i);
    cv::imwrite(buf, mask);
  }
  return 0;
}
