// Golden-mask oracle for the deterministic BGS families: compiles the
// REFERENCE sources in-place from /root/reference (never copied into this
// repo) and dumps per-frame foreground masks as PNGs for golden tests.
//
// Covered (16 algorithms, all rand()-free => deterministic):
//   dp framework: adaptive_median grimson_gmm zivkovic mean wren_ga
//                 prati_mediod eigenbackground t2fgmm_um t2fgmm_uv
//   lb framework: lb_gauss lb_fuzzygauss lb_mog lb_som lb_fuzzysom
//   av:           vumeter      db: imbs
//
// Each subcommand reproduces its IBGS wrapper's exact call sequence and
// constructor defaults (e.g. DPAdaptiveMedianBGS.cpp:46-68, the
// Subtract/Clear/Update order; LBAdaptiveSOM.cpp:40-58 the
// InitModel-then-UpdateModel-every-frame order incl. the first frame;
// VuMeter.cpp:42-70 the CV_RGB2GRAY-on-BGR quirk + erode/medianBlur(5)
// post filter) without the wrappers' CvFileStorage config machinery
// (removed from OpenCV 4.x).
//
// Usage: family_oracle <algo> <video> <out_dir> <max_frames>
#include "cv4_shim.h"

#include <opencv2/imgproc.hpp>
#include <opencv2/imgproc/imgproc_c.h>
#include <opencv2/imgcodecs.hpp>
#include <opencv2/videoio.hpp>
#include <opencv2/core/core_c.h>
#include <cstdio>
#include <functional>
#include <string>

#include "AdaptiveMedianBGS.h"
#include "GrimsonGMM.h"
#include "ZivkovicAGMM.h"
#include "MeanBGS.h"
#include "WrenGA.h"
#include "PratiMediodBGS.h"
#include "Eigenbackground.h"
#include "T2FGMM.h"
#include "BGModelGauss.h"
#include "BGModelFuzzyGauss.h"
#include "BGModelMog.h"
#include "BGModelSom.h"
#include "BGModelFuzzySom.h"
#include "TBackgroundVuMeter.h"
#include "imbs.hpp"

using namespace Algorithms::BackgroundSubtraction;

static void write_mask(const cv::Mat& fg, const std::string& out, int fn) {
  char buf[512];
  snprintf(buf, sizeof buf, "%s/mask_%04d.png", out.c_str(), fn);
  cv::imwrite(buf, fg);
}

// dp family: wrapper sequence per DPAdaptiveMedianBGS.cpp:46-75 —
// first frame InitModel, then every frame Subtract / low.Clear / Update,
// output = high-threshold mask.
template <class ALG, class PARAMS>
static int run_dp(cv::VideoCapture& cap, const std::string& out, int maxf,
                  std::function<void(PARAMS&)> setup) {
  ALG bgs;
  PARAMS params;
  BwImage low, high;
  RgbImage frame_data;
  bool first = true;
  int fn = 0;
  cv::Mat frame;
  while (fn < maxf && cap.read(frame)) {
    IplImage ipl = cvIplImage(frame);
    if (first) frame_data.ReleaseMemory(false);
    frame_data = &ipl;
    if (first) {
      int w = frame.cols, h = frame.rows;
      low = cvCreateImage(cvSize(w, h), IPL_DEPTH_8U, 1);
      low.Ptr()->origin = IPL_ORIGIN_BL;
      high = cvCreateImage(cvSize(w, h), IPL_DEPTH_8U, 1);
      high.Ptr()->origin = IPL_ORIGIN_BL;
      params.SetFrameSize(w, h);
      setup(params);
      bgs.Initalize(params);
      bgs.InitModel(frame_data);
      first = false;
    }
    bgs.Subtract(fn, frame_data, low, high);
    low.Clear();
    bgs.Update(fn, frame_data, low);
    write_mask(cv::cvarrToMat(high.Ptr()), out, fn);
    fn++;
  }
  return 0;
}

// lb family: wrapper sequence per LBAdaptiveSOM.cpp:40-58 — InitModel on
// the first frame, then setBGModelParameter + UpdateModel EVERY frame
// (including the first), output = GetFG().
static int run_lb(cv::VideoCapture& cap, const std::string& out, int maxf,
                  const std::string& kind) {
  lb_library::BGModel* m = nullptr;
  bool first = true;
  int fn = 0;
  cv::Mat frame;
  while (fn < maxf && cap.read(frame)) {
    IplImage ipl = cvIplImage(frame);
    if (first) {
      int w = frame.cols, h = frame.rows;
      if (kind == "lb_gauss")
        m = new lb_library::SimpleGaussian::BGModelGauss(w, h);
      else if (kind == "lb_fuzzygauss")
        m = new lb_library::FuzzyGaussian::BGModelFuzzyGauss(w, h);
      else if (kind == "lb_mog")
        m = new lb_library::MixtureOfGaussians::BGModelMog(w, h);
      else if (kind == "lb_som")
        m = new lb_library::AdaptiveSOM::BGModelSom(w, h);
      else
        m = new lb_library::FuzzyAdaptiveSOM::BGModelFuzzySom(w, h);
      m->InitModel(&ipl);
      first = false;
    }
    // wrapper ctor defaults (LBSimpleGaussian.cpp:20, LBFuzzyGaussian.cpp:20,
    // LBMixtureOfGaussians.cpp:20, LBAdaptiveSOM.cpp:20-21,
    // LBFuzzyAdaptiveSOM.cpp:20-21)
    if (kind == "lb_gauss") {
      m->setBGModelParameter(0, 66);   // sensitivity
      m->setBGModelParameter(1, 162);  // noiseVariance
      m->setBGModelParameter(2, 18);   // learningRate
    } else if (kind == "lb_fuzzygauss") {
      m->setBGModelParameter(0, 72);   // sensitivity
      m->setBGModelParameter(1, 162);  // bgThreshold
      m->setBGModelParameter(2, 49);   // learningRate
      m->setBGModelParameter(3, 195);  // noiseVariance
    } else if (kind == "lb_mog") {
      m->setBGModelParameter(0, 81);   // sensitivity
      m->setBGModelParameter(1, 83);   // bgThreshold
      m->setBGModelParameter(2, 59);   // learningRate
      m->setBGModelParameter(3, 206);  // noiseVariance
    } else if (kind == "lb_som") {
      m->setBGModelParameter(0, 75);   // sensitivity
      m->setBGModelParameter(1, 245);  // trainingSensitivity
      m->setBGModelParameter(2, 62);   // learningRate
      m->setBGModelParameter(3, 255);  // trainingLearningRate
      m->setBGModelParameter(5, 55);   // trainingSteps
    } else {  // lb_fuzzysom
      m->setBGModelParameter(0, 90);
      m->setBGModelParameter(1, 240);
      m->setBGModelParameter(2, 38);
      m->setBGModelParameter(3, 255);
      m->setBGModelParameter(5, 81);
    }
    m->UpdateModel(&ipl);
    write_mask(cv::cvarrToMat(m->GetFG()), out, fn);
    fn++;
  }
  delete m;
  return 0;
}

// av VuMeter: wrapper sequence per VuMeter.cpp:33-70 — note the
// CV_RGB2GRAY conversion applied to BGR capture data (R/B-swapped gray
// weights, reproduced via COLOR_RGB2GRAY) and the enableFilter default
// (erode 3x3 once + medianBlur 5).
static int run_vumeter(cv::VideoCapture& cap, const std::string& out, int maxf) {
  TBackgroundVuMeter bgs;
  bgs.SetAlpha(0.995);
  bgs.SetBinSize(8);
  bgs.SetThreshold(0.03);
  IplImage *gray = nullptr, *background = nullptr, *mask = nullptr;
  bool first = true;
  int fn = 0;
  cv::Mat frame;
  while (fn < maxf && cap.read(frame)) {
    cv::Mat gray_m;
    cv::cvtColor(frame, gray_m, cv::COLOR_RGB2GRAY);
    if (first) {
      IplImage gipl = cvIplImage(gray_m);
      gray = cvCloneImage(&gipl);
      background = cvCloneImage(gray);
      mask = cvCreateImage(cvGetSize(gray), IPL_DEPTH_8U, 1);
      cvZero(mask);
      first = false;
    } else {
      IplImage gipl = cvIplImage(gray_m);
      cvCopy(&gipl, gray);
    }
    bgs.UpdateBackground(gray, background, mask);
    cv::Mat fg = cv::cvarrToMat(mask).clone();
    cv::erode(fg, fg, cv::Mat());
    cv::medianBlur(fg, fg, 5);
    write_mask(fg, out, fn);
    fn++;
  }
  return 0;
}

// db IMBS: wrapper per IndependentMultimodalBGS.cpp — ctor fps=10,
// apply(frame, fg) every frame.
static int run_imbs(cv::VideoCapture& cap, const std::string& out, int maxf) {
  BackgroundSubtractorIMBS imbs(10.);
  int fn = 0;
  cv::Mat frame, fg;
  while (fn < maxf && cap.read(frame)) {
    imbs.apply(frame, fg);
    write_mask(fg, out, fn);
    fn++;
  }
  return 0;
}

int main(int argc, char** argv) {
  if (argc < 5) {
    fprintf(stderr, "usage: family_oracle <algo> <video> <out_dir> <max_frames>\n");
    return 1;
  }
  std::string algo = argv[1], src = argv[2], out = argv[3];
  int maxf = atoi(argv[4]);
  cv::VideoCapture cap(src);
  if (!cap.isOpened()) {
    fprintf(stderr, "bad src\n");
    return 1;
  }
  // dp defaults from each wrapper ctor (DPGrimsonGMMBGS.cpp:20 etc.)
  if (algo == "adaptive_median")
    return run_dp<AdaptiveMedianBGS, AdaptiveMedianParams>(
        cap, out, maxf, [](AdaptiveMedianParams& p) {
          p.LowThreshold() = 40;
          p.HighThreshold() = 80;
          p.SamplingRate() = 7;
          p.LearningFrames() = 30;
        });
  if (algo == "grimson_gmm")
    return run_dp<GrimsonGMM, GrimsonParams>(cap, out, maxf, [](GrimsonParams& p) {
      p.LowThreshold() = 9.0f;
      p.HighThreshold() = 18.0f;
      p.Alpha() = 0.01f;
      p.MaxModes() = 3;
    });
  if (algo == "zivkovic")
    return run_dp<ZivkovicAGMM, ZivkovicParams>(cap, out, maxf, [](ZivkovicParams& p) {
      p.LowThreshold() = 25.0f;
      p.HighThreshold() = 50.0f;
      p.Alpha() = 0.001f;
      p.MaxModes() = 3;
    });
  if (algo == "mean")
    return run_dp<MeanBGS, MeanParams>(cap, out, maxf, [](MeanParams& p) {
      p.LowThreshold() = 2700;
      p.HighThreshold() = 5400;
      p.Alpha() = 1e-6f;
      p.LearningFrames() = 30;
    });
  if (algo == "wren_ga")
    return run_dp<WrenGA, WrenParams>(cap, out, maxf, [](WrenParams& p) {
      p.LowThreshold() = 12.25f;
      p.HighThreshold() = 24.5f;
      p.Alpha() = 0.005f;
      p.LearningFrames() = 30;
    });
  if (algo == "prati_mediod")
    return run_dp<PratiMediodBGS, PratiParams>(cap, out, maxf, [](PratiParams& p) {
      p.LowThreshold() = 30;
      p.HighThreshold() = 60;
      p.SamplingRate() = 5;
      p.HistorySize() = 16;
      p.Weight() = 5;
    });
  if (algo == "eigenbackground")
    return run_dp<Eigenbackground, EigenbackgroundParams>(
        cap, out, maxf, [](EigenbackgroundParams& p) {
          p.LowThreshold() = 225;
          p.HighThreshold() = 450;
          p.HistorySize() = 20;
          p.EmbeddedDim() = 10;
        });
  if (algo == "t2fgmm_um" || algo == "t2fgmm_uv") {
    bool um = algo == "t2fgmm_um";
    return run_dp<T2FGMM, T2FGMMParams>(cap, out, maxf, [um](T2FGMMParams& p) {
      p.LowThreshold() = 9.0f;
      p.HighThreshold() = 18.0f;
      p.Alpha() = 0.01f;
      p.MaxModes() = 3;
      p.Type() = um ? TYPE_T2FGMM_UM : TYPE_T2FGMM_UV;
      p.KM() = 1.5f;
      p.KV() = 0.6f;
    });
  }
  if (algo.rfind("lb_", 0) == 0) return run_lb(cap, out, maxf, algo);
  if (algo == "vumeter") return run_vumeter(cap, out, maxf);
  if (algo == "imbs") return run_imbs(cap, out, maxf);
  fprintf(stderr, "unknown algo %s\n", algo.c_str());
  return 1;
}
