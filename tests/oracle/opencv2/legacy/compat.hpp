// stub: OpenCV legacy compat header removed in 4.x; symbols the jmo
// sources actually use are provided by cv4_shim.h
#pragma once
