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
