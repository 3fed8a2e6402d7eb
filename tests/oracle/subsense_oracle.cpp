// Golden-mask oracle: compiles the REFERENCE SuBSENSE/LOBSTER sources in-place
// from /root/reference (never copied into this repo) against OpenCV 4.x and
// dumps per-frame foreground masks as PNGs for golden tests.
// OpenCV 2.x -> 4.x shims: forward-declare cv::AlgorithmInfo (only named in a
// never-called virtual decl) and provide the pure-virtual 4.x apply().
// Usage: subsense_oracle <subsense|lobster> <video> <out_dir> <max_frames> [gray]
#include "cv4_shim.h"

#include <opencv2/imgproc.hpp>
#include <opencv2/imgcodecs.hpp>
#include <opencv2/videoio.hpp>
#include "BackgroundSubtractorSuBSENSE.h"
#include "BackgroundSubtractorLOBSTER.h"
#include <cstdio>
#include <string>

struct SubImpl : BackgroundSubtractorSuBSENSE {
  void apply(cv::InputArray i, cv::OutputArray o, double lr) CV_OVERRIDE { (*this)(i, o, lr); }
};
struct LobImpl : BackgroundSubtractorLOBSTER {
  void apply(cv::InputArray i, cv::OutputArray o, double lr) CV_OVERRIDE { (*this)(i, o, lr); }
};

int main(int argc, char** argv) {
  if (argc < 5) { fprintf(stderr, "args\n"); return 1; }
  std::string algo = argv[1], src = argv[2], out = argv[3];
  int maxf = atoi(argv[4]);
  bool gray = argc > 5 && std::string(argv[5]) == std::string("gray");
  cv::VideoCapture cap(src);
  if (!cap.isOpened()) { fprintf(stderr, "bad src\n"); return 1; }
  SubImpl sub;
  LobImpl lob;
  cv::Mat frame, mask;
  bool first = true;
  for (int i = 0; i < maxf; ++i) {
    if (!cap.read(frame)) break;
    if (gray) cv::cvtColor(frame, frame, cv::COLOR_BGR2GRAY);
    if (first) {
      cv::Mat roi(frame.size(), CV_8UC1, cv::Scalar_<uchar>(255));
      if (algo == "subsense") sub.initialize(frame, roi); else lob.initialize(frame, roi);
      first = false;
    }
    if (algo == "subsense") sub(frame, mask); else lob(frame, mask);
    char buf[512];
    snprintf(buf, sizeof buf, "%s/mask_%04d.png", out.c_str(), i);
    cv::imwrite(buf, mask);
  }
  return 0;
}
