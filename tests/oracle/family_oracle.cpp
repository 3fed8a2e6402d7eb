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
#include <cstdlib>
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
#include "T2FMRF.h"
#include "MRF.h"
#include "FuzzyUtils.h"
#include "TextureBGS.h"
#include "sdLaMa091.h"
#include "BGModelGauss.h"
#include "BGModelFuzzyGauss.h"
#include "BGModelMog.h"
#include "BGModelSom.h"
#include "BGModelFuzzySom.h"
#include "TBackgroundVuMeter.h"
#include "imbs.hpp"
#include "NPBGSubtractor.h"
#include "SJN_MultiCueBGS.h"
#include "MultiLayerBGS.h"
// root-package wrappers (process() IS the algorithm; ctor defaults apply
// because the shim's config reads return the caller's default)
#include "FrameDifferenceBGS.h"
#include "StaticFrameDifferenceBGS.h"
#include "WeightedMovingMeanBGS.h"
#include "WeightedMovingVarianceBGS.h"
#include "AdaptiveBackgroundLearning.h"
#include "AdaptiveSelectiveBackgroundLearning.h"
#include "MyBGS.h"

using namespace Algorithms::BackgroundSubtraction;

// cvFillImage lived in opencv2/legacy/compat.hpp (removed in 4.x)
static void fill_image(IplImage* im, double v) { cvSet(im, cvScalarAll(v)); }

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

// tb T2FMRF_UM/UV: wrapper sequence per T2FMRF_UM.cpp:46-123 — dp-style
// Subtract/Clear/Update plus the MRF_TC ICM relaxation of the LOW mask from
// frame 10 on (the MRF result feeds the conditional model update; the
// emitted mask is the HIGH threshold mask).
static int run_t2fmrf(cv::VideoCapture& cap, const std::string& out, int maxf,
                      bool um) {
  T2FMRF bgs;
  T2FMRFParams params;
  MRF_TC mrf;
  GMM* gmm;
  HMM* hmm;
  BwImage low, high;
  RgbImage frame_data;
  IplImage *old_labeling = nullptr, *old_img = nullptr;
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
      params.LowThreshold() = 9.0f;
      params.HighThreshold() = 18.0f;
      params.Alpha() = 0.01f;
      params.MaxModes() = 3;
      params.Type() = um ? TYPE_T2FMRF_UM : TYPE_T2FMRF_UV;
      params.KM() = 2.0f;
      params.KV() = 0.9f;
      bgs.Initalize(params);
      bgs.InitModel(frame_data);
      old_labeling = cvCreateImage(cvSize(w, h), IPL_DEPTH_8U, 1);
      old_img = cvCreateImage(cvSize(w, h), IPL_DEPTH_8U, 1);
      mrf.height = h;
      mrf.width = w;
      mrf.Build_Classes_OldLabeling_InImage_LocalEnergy();
      first = false;
    }
    bgs.Subtract(fn, frame_data, low, high);
    cvCopy(low.Ptr(), old_img);
    if (fn >= 10) {
      gmm = bgs.gmm();
      hmm = bgs.hmm();
      mrf.background2 = frame_data.Ptr();
      mrf.in_image = low.Ptr();
      mrf.out_image = low.Ptr();
      mrf.InitEvidence2(gmm, hmm, old_labeling);
      mrf.ICM2();
      cvCopy(mrf.out_image, low.Ptr());
    }
    cvCopy(old_img, old_labeling);
    low.Clear();
    bgs.Update(fn, frame_data, low);
    write_mask(cv::cvarrToMat(high.Ptr()), out, fn);
    fn++;
  }
  return 0;
}

// tb FuzzySugenoIntegral / FuzzyChoquetIntegral: wrapper sequence per
// FuzzySugenoIntegral.cpp:31-170 — f32/255 images, adaptive-learn phase for
// frames 0..framesToLearn (no mask emitted; zeros written to keep frame
// numbering), then LBP + similarity degrees + fuzzy integral (option 2:
// 2 color + 1 texture, measure 0.6/0.3/0.1), medianBlur(3), INV threshold
// 0.67, and adaptive-SELECTIVE background update.
static int run_fuzzy(cv::VideoCapture& cap, const std::string& out, int maxf,
                     bool sugeno) {
  FuzzyUtils fu;
  const int framesToLearn = 10;
  const double alphaLearn = 0.1, alphaUpdate = 0.01, threshold = 0.67;
  const int colorSpace = 1, option = 2;
  cv::Mat bg_f3;
  int fn = 0;
  cv::Mat frame;
  while (fn < maxf && cap.read(frame)) {
    cv::Mat in_f3(frame.size(), CV_32F);
    frame.convertTo(in_f3, CV_32F, 1. / 255.);
    if (fn <= framesToLearn) {
      if (bg_f3.empty())
        in_f3.copyTo(bg_f3);
      else
        bg_f3 = alphaLearn * in_f3 + (1 - alphaLearn) * bg_f3;
      write_mask(cv::Mat::zeros(frame.size(), CV_8U), out, fn);
      fn++;
      continue;
    }
    cv::Mat in_f1, bg_f1;
    cv::cvtColor(in_f3, in_f1, cv::COLOR_BGR2GRAY);
    cv::cvtColor(bg_f3, bg_f1, cv::COLOR_BGR2GRAY);
    IplImage input_f3 = cvIplImage(in_f3), input_f1 = cvIplImage(in_f1);
    IplImage background_f3 = cvIplImage(bg_f3), background_f1 = cvIplImage(bg_f1);

    IplImage* lbp_in = cvCreateImage(cvGetSize(&input_f1), IPL_DEPTH_32F, 1);
    fill_image(lbp_in, 0.0);
    fu.LBP(&input_f1, lbp_in);
    IplImage* lbp_bg = cvCreateImage(cvGetSize(&background_f1), IPL_DEPTH_32F, 1);
    fill_image(lbp_bg, 0.0);
    fu.LBP(&background_f1, lbp_bg);

    IplImage* sim_tex = cvCreateImage(cvGetSize(&input_f1), IPL_DEPTH_32F, 1);
    fu.SimilarityDegreesImage(lbp_in, lbp_bg, sim_tex, 1, colorSpace);
    IplImage* sim_col = cvCreateImage(cvGetSize(&input_f3), IPL_DEPTH_32F, 3);
    fu.SimilarityDegreesImage(&input_f3, &background_f3, sim_col, 3, colorSpace);

    float measureG[3];
    fu.FuzzyMeasureG(0.6f, 0.3f, 0.1f, measureG);  // option 2
    IplImage* integral = cvCreateImage(cvGetSize(&input_f1), IPL_DEPTH_32F, 1);
    if (sugeno)
      fu.getFuzzyIntegralSugeno(sim_tex, sim_col, option, measureG, integral);
    else
      fu.getFuzzyIntegralChoquet(sim_tex, sim_col, option, measureG, integral);

    cv::Mat integ = cv::cvarrToMat(integral);
    cv::medianBlur(integ, integ, 3);
    cv::Mat fg_f1;
    cv::threshold(integ, fg_f1, threshold, 255, cv::THRESH_BINARY_INV);
    cv::Mat fg_u1;
    fg_f1.convertTo(fg_u1, CV_8U, 255.0);
    write_mask(fg_u1, out, fn);

    IplImage integ_ipl = cvIplImage(integ);
    IplImage* upd_bg = cvCreateImage(cvGetSize(&input_f1), IPL_DEPTH_32F, 3);
    fill_image(upd_bg, 0.0);
    fu.AdaptativeSelectiveBackgroundModelUpdate(
        &input_f3, &background_f3, upd_bg, &integ_ipl, threshold, alphaUpdate);
    cv::cvarrToMat(upd_bg).copyTo(bg_f3);

    cvReleaseImage(&lbp_in);
    cvReleaseImage(&lbp_bg);
    cvReleaseImage(&sim_tex);
    cvReleaseImage(&sim_col);
    cvReleaseImage(&integral);
    cvReleaseImage(&upd_bg);
    fn++;
  }
  return 0;
}

// bl SigmaDelta: wrapper per SigmaDeltaBGS.cpp:20-55 — defaults amp=1,
// minVar=15, maxVar=255; the first frame only initializes (zeros written),
// then per-frame sdLaMa091Update with the C3R mask collapsed to one channel.
static int run_sigma_delta(cv::VideoCapture& cap, const std::string& out,
                           int maxf) {
  sdLaMa091_t* alg = sdLaMa091New();
  sdLaMa091SetAmplificationFactor(alg, 1);
  sdLaMa091SetMinimalVariance(alg, 15);
  sdLaMa091SetMaximalVariance(alg, 255);
  bool first = true;
  int fn = 0;
  cv::Mat frame;
  while (fn < maxf && cap.read(frame)) {
    if (first) {
      sdLaMa091AllocInit_8u_C3R(alg, frame.data, frame.cols, frame.rows,
                                frame.step);
      write_mask(cv::Mat::zeros(frame.size(), CV_8U), out, fn);
      first = false;
      fn++;
      continue;
    }
    cv::Mat tmp(frame.rows, frame.cols, CV_8UC3);
    sdLaMa091Update_8u_C3R(alg, frame.data, tmp.data);
    cv::Mat fg(frame.rows, frame.cols, CV_8UC1);
    const unsigned char* t = tmp.data;
    unsigned char* o = fg.data;
    for (size_t i = 0; i < fg.total(); ++i, ++o, t += 3) *o = *t;
    write_mask(fg, out, fn);
    fn++;
  }
  sdLaMa091Free(alg);
  return 0;
}

// dp Texture: wrapper per DPTextureBGS.cpp:39-133 — LBP texture image,
// per-pixel RGB histograms, BgsCompare at THRESHOLD, mask emitted BEFORE
// UpdateModel (first frame included; model seeded from frame 0's histograms
// on every mode).
static int run_texture(cv::VideoCapture& cap, const std::string& out,
                       int maxf) {
  TextureBGS bgs;
  RgbImage image;
  BwImage fgMask;
  RgbImage texture;
  TextureArray* bgModel = nullptr;
  unsigned char* modeArray = nullptr;
  TextureHistogram* curTextureHist = nullptr;
  bool first = true;
  int fn = 0;
  cv::Mat frame;
  while (fn < maxf && cap.read(frame)) {
    IplImage ipl = cvIplImage(frame);
    if (first) {
      int w = frame.cols, h = frame.rows, size = w * h;
      image = cvCreateImage(cvSize(w, h), 8, 3);
      cvCopy(&ipl, image.Ptr());
      fgMask = cvCreateImage(cvSize(w, h), 8, 1);
      cvZero(fgMask.Ptr());
      bgModel = new TextureArray[size];
      texture = cvCreateImage(cvSize(w, h), 8, 3);
      cvZero(texture.Ptr());
      modeArray = new unsigned char[size];
      curTextureHist = new TextureHistogram[size];
      bgs.LBP(image, texture);
      bgs.Histogram(texture, curTextureHist);
      for (int y = REGION_R + TEXTURE_R; y < h - REGION_R - TEXTURE_R; ++y)
        for (int x = REGION_R + TEXTURE_R; x < w - REGION_R - TEXTURE_R; ++x) {
          int index = x + y * w;
          for (int m = 0; m < NUM_MODES; ++m)
            for (int i = 0; i < NUM_BINS; ++i) {
              bgModel[index].mode[m].r[i] = curTextureHist[index].r[i];
              bgModel[index].mode[m].g[i] = curTextureHist[index].g[i];
              bgModel[index].mode[m].b[i] = curTextureHist[index].b[i];
            }
        }
      first = false;
    }
    cvCopy(&ipl, image.Ptr());
    bgs.LBP(image, texture);
    bgs.Histogram(texture, curTextureHist);
    bgs.BgsCompare(bgModel, curTextureHist, modeArray, THRESHOLD, fgMask);
    write_mask(cv::cvarrToMat(fgMask.Ptr()), out, fn);
    bgs.UpdateModel(fgMask, bgModel, curTextureHist, modeArray);
    fn++;
  }
  delete[] bgModel;
  delete[] modeArray;
  delete[] curTextureHist;
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

// ae KDE: wrapper sequence per KDE.cpp:34-96 (Intialize/SetThresholds,
// AddFrame for frames 0..9 with no output, Estimation at frame 10, then
// NBBGSubtraction + Update every frame). The reference reads UpdateBGFlag
// uninitialized (NPBGSubtractor's ctor is empty, NPBGSubtractor.h:98, and
// KDE.cpp never calls SetUpdateFlag); we pin it to the author-documented
// intent ("at each frame also you can call the update function to adapt
// the bg", KDE.cpp:84-86) via SetUpdateFlag(1), matching the rebuild's
// updateBG=True default.
static int run_kde(cv::VideoCapture& cap, const std::string& out, int maxf) {
  NPBGSubtractor sub;
  unsigned char* FGImage = nullptr;
  int fn = 0, framesToLearn = 10;
  cv::Mat frame;
  while (fn < maxf && cap.read(frame)) {
    if (fn == 0) {
      sub.Intialize(frame.rows, frame.cols, frame.channels(), 50, 100, 1, 1);
      sub.SetThresholds(10e-8, 0.3);
      sub.SetUpdateFlag(1);
      FGImage = new unsigned char[frame.rows * frame.cols];
    }
    if (fn < framesToLearn) {
      sub.AddFrame(frame.data);
      write_mask(cv::Mat::zeros(frame.rows, frame.cols, CV_8UC1), out, fn);
      fn++;
      continue;
    }
    if (fn == framesToLearn) sub.Estimation();
    sub.NBBGSubtraction(frame.data, FGImage, 0, 0);
    sub.Update(FGImage);
    write_mask(cv::Mat(frame.rows, frame.cols, CV_8UC1, FGImage), out, fn);
    fn++;
  }
  delete[] FGImage;
  return 0;
}

// sjn MultiCue / jmo MultiLayer: their IBGS process() IS the wrapper (config
// I/O and imshow are stubbed to ctor defaults / no-ops by cv4_shim.h; the
// only source edits are build-time OpenCV-4 API compat patches, see
// test_golden_cpp.py _COMPAT_PATCHES). MultiCue's emitted map is the
// bilinearly-enlarged 3-channel result (identical channels) — keep ch 0.
template <class IBGS_T>
static int run_ibgs(cv::VideoCapture& cap, const std::string& out, int maxf) {
  IBGS_T bgs;
  int fn = 0;
  cv::Mat frame, fg, bgm;
  while (fn < maxf && cap.read(frame)) {
    fg = cv::Mat();
    bgs.process(frame, fg, bgm);
    if (fg.empty())
      fg = cv::Mat::zeros(frame.rows, frame.cols, CV_8UC1);
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
  if (algo == "t2fmrf_um") return run_t2fmrf(cap, out, maxf, true);
  if (algo == "t2fmrf_uv") return run_t2fmrf(cap, out, maxf, false);
  if (algo == "fuzzy_sugeno") return run_fuzzy(cap, out, maxf, true);
  if (algo == "fuzzy_choquet") return run_fuzzy(cap, out, maxf, false);
  if (algo == "sigma_delta") return run_sigma_delta(cap, out, maxf);
  if (algo == "texture") return run_texture(cap, out, maxf);
  if (algo.rfind("lb_", 0) == 0) return run_lb(cap, out, maxf, algo);
  if (algo == "vumeter") return run_vumeter(cap, out, maxf);
  if (algo == "imbs") return run_imbs(cap, out, maxf);
  if (algo == "kde") return run_kde(cap, out, maxf);
  if (algo == "multicue") return run_ibgs<SJN_MultiCueBGS>(cap, out, maxf);
  if (algo == "multilayer") return run_ibgs<MultiLayerBGS>(cap, out, maxf);
  // root package: each process() is self-contained (FrameDifferenceBGS.cpp:
  // 29-60 and siblings); run_ibgs writes zeros for the early-return warm-up
  // frames where the wrapper leaves img_output untouched.
  if (algo == "framediff") return run_ibgs<FrameDifferenceBGS>(cap, out, maxf);
  if (algo == "staticdiff")
    return run_ibgs<StaticFrameDifferenceBGS>(cap, out, maxf);
  if (algo == "wmm") return run_ibgs<WeightedMovingMeanBGS>(cap, out, maxf);
  if (algo == "wmv") return run_ibgs<WeightedMovingVarianceBGS>(cap, out, maxf);
  if (algo == "abl") return run_ibgs<AdaptiveBackgroundLearning>(cap, out, maxf);
  if (algo == "asbl")
    return run_ibgs<AdaptiveSelectiveBackgroundLearning>(cap, out, maxf);
  if (algo == "mybgs") return run_ibgs<MyBGS>(cap, out, maxf);
  fprintf(stderr, "unknown algo %s\n", algo.c_str());
  return 1;
}
