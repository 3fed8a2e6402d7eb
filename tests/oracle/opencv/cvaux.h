// Stub for OpenCV 2.x's <opencv/cvaux.h>, removed in 4.x. Pulled in by the
// reference's ck/MotionDetection.cpp:29-33. The only symbols it needs from
// cvaux/legacy are the C optical-flow API used by OpticalFlowCorrection()
// (MotionDetection.cpp:953-1080) — which is DEAD CODE in the oracle: the
// LbpMrf wrapper runs md_LBPHistograms mode and the optical-flow branch is
// gated on md_DLBPHistograms (MotionDetection.cpp:568-572). Declarations
// abort if ever reached so silent divergence is impossible.
#pragma once
#include <opencv2/core/core_c.h>
#include <cstdio>
#include <cstdlib>

#ifndef CV_LKFLOW_PYR_A_READY
#define CV_LKFLOW_PYR_A_READY 1
#define CV_LKFLOW_PYR_B_READY 2
#define CV_LKFLOW_INITIAL_GUESSES 4
#endif

static inline void cvCalcOpticalFlowPyrLK(
    const CvArr*, const CvArr*, CvArr*, CvArr*, const CvPoint2D32f*,
    CvPoint2D32f*, int, CvSize, int, char*, float*, CvTermCriteria, int) {
  fprintf(stderr, "cvCalcOpticalFlowPyrLK stub reached (md_DLBPHistograms?)\n");
  abort();
}

// cvGoodFeaturesToTrack left to OpenCV's imgproc_c.h if present; if the
// toolchain lacks it, the same dead-code argument applies — add an aborting
// stub here guarded by a feature test.
