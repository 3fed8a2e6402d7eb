// Injected via -include into every reference TU: OpenCV 2.x declared
// cv::AlgorithmInfo, which 4.x removed; the reference only names it in a
// never-called virtual declaration, so a forward declaration suffices.
#pragma once
#include <opencv2/core.hpp>
// C-API types/functions (IplImage, cvCreateImage, cvCvtColor, ...) used by
// the dp/lb/av reference frameworks; still shipped in OpenCV 4.x.
#include <opencv2/core/core_c.h>
#include <opencv2/imgproc/imgproc_c.h>
#include <opencv2/imgproc.hpp>
// 4.x CV_RGB returns cv::Scalar, which no longer implicitly converts to the
// CvScalar the C API (cvSet) takes — restore the C-compatible form.
#undef CV_RGB
#define CV_RGB(r, g, b) cvScalar((b), (g), (r), 0)
namespace cv { class AlgorithmInfo; }
// --- OpenCV 2.x persistence C-API (behind `#if 0` in 4.x types_c.h) -------
// No-op stubs so reference wrapper TUs compile: reads return the caller's
// default (== the wrapper's constructor defaults — config files are never
// present in oracle runs anyway), writes do nothing.
typedef struct CvFileStorage CvFileStorage;
#define CV_STORAGE_READ 0
#define CV_STORAGE_WRITE 1
static inline CvFileStorage* cvOpenFileStorage(const char*, void*, int) { return 0; }
static inline void cvReleaseFileStorage(CvFileStorage**) {}
static inline void cvWriteInt(CvFileStorage*, const char*, int) {}
static inline void cvWriteReal(CvFileStorage*, const char*, double) {}
static inline void cvWriteString(CvFileStorage*, const char*, const char*, int cv_quote = 0) {}
static inline int cvReadIntByName(const CvFileStorage*, const void*, const char*, int dflt = 0) { return dflt; }
static inline double cvReadRealByName(const CvFileStorage*, const void*, const char*, double dflt = 0.) { return dflt; }
static inline const char* cvReadStringByName(const CvFileStorage*, const void*, const char*, const char* dflt = 0) { return dflt; }
// --- headless: route the wrappers' cv::imshow to a no-op ------------------
// (function-like macro rewrites the *identifier*, keeping the cv:: prefix)
namespace cv { static inline void imshow_oracle_noop(const String&, InputArray) {} }
#define imshow(...) imshow_oracle_noop(__VA_ARGS__)
static inline void cvShowImage(const char*, const void*) {}
// --- legacy aliases (opencv2/legacy/compat.hpp, removed in 4.x) ------------
#define cvCopyImage(src, dst) cvCopy(src, dst, 0)
