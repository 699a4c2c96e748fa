#pragma once
// Space inference: duplicate-space removal + lost-space detection via a
// Levenberg-Marquardt pitch-curve fit per line.
#include "types.h"

namespace lineengine {

void space_check(std::vector<Box>& boxes);

}  // namespace lineengine
