// Golden-mask oracle for LbpMrf (ck package): compiles the REFERENCE
// sources in place from /root/reference (never vendored) and dumps
// per-frame foreground masks as PNGs.
//
// Replays the LbpMrf wrapper's exact call sequence (LbpMrf.cpp:25-68):
// MotionDetection in md_LBPHistograms mode, per frame SetIplImage →
// DetectMotions → GetMotionsMask. The wrapper's only config field is
// showOutput, so ctor defaults apply verbatim. The reference's MRF
// optimization here is the Boykov-Kolmogorov max-flow graph cut
// (MotionDetection.cpp:1181-1276, ck/maxflow.cpp); the rebuild replaces it
// with fixed-iteration ICM relaxation (bgs/lbp_mrf.py, per SURVEY §7's
// prescription), so the golden gate for this algorithm is agreement-level,
// not bit-level.
//
// Usage: lbpmrf_oracle <video> <out_dir> <max_frames>
#include "cv4_shim.h"

#include <opencv2/imgproc.hpp>
#include <opencv2/imgcodecs.hpp>
#include <opencv2/videoio.hpp>
#include <opencv2/core/core_c.h>
#include <cstdio>
#include <string>

#include "MotionDetection.hpp"
#include "MEImage.hpp"

static void write_mask(const cv::Mat& fg, const std::string& out, int fn) {
  char buf[512];
  snprintf(buf, sizeof buf, "%s/mask_%04d.png", out.c_str(), fn);
  cv::imwrite(buf, fg);
}

int main(int argc, char** argv) {
  if (argc < 4) {
    fprintf(stderr, "usage: lbpmrf_oracle <video> <out_dir> <max_frames>\n");
    return 1;
  }
  std::string src = argv[1], out = argv[2];
  int maxf = atoi(argv[3]);
  cv::VideoCapture cap(src);
  if (!cap.isOpened()) {
    fprintf(stderr, "bad src\n");
    return 1;
  }

  MotionDetection detector;
  detector.SetMode(MotionDetection::md_LBPHistograms);  // LbpMrf.cpp:29

  int fn = 0;
  cv::Mat frame;
  while (fn < maxf && cap.read(frame)) {
    IplImage ipl = cvIplImage(frame);  // 4.x twin of `IplImage T(img)` :51
    MEImage input(frame.cols, frame.rows, frame.channels());
    MEImage output(frame.cols, frame.rows, frame.channels());
    input.SetIplImage((void*)&ipl);
    detector.DetectMotions(input);
    detector.GetMotionsMask(output);
    cv::Mat fg = cv::cvarrToMat((IplImage*)output.GetIplImage()).clone();
    if (fg.channels() > 1) {
      cv::Mat ch[3];
      cv::split(fg, ch);
      fg = ch[0];
    }
    write_mask(fg, out, fn);
    fn++;
  }
  return 0;
}
