// Injected via -include into every reference TU: OpenCV 2.x declared
// cv::AlgorithmInfo, which 4.x removed; the reference only names it in a
// never-called virtual declaration, so a forward declaration suffices.
#pragma once
#include <opencv2/core.hpp>
namespace cv { class AlgorithmInfo; }
