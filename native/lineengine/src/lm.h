#pragma once
// Small dense Levenberg-Marquardt least-squares solver (no Jacobian:
// forward-difference). Fresh implementation of the lmdif1 capability the
// reference vendors from MINPACK (/root/reference/textline_detect/src/minpack/),
// sized for the low-dimensional curve fits the line engine needs.
#include <functional>
#include <vector>

namespace lineengine {

// Minimize sum_i r_i(x)^2 over x. `residuals(x, r)` fills r (size m).
// Returns final parameters; iterates until convergence or max_iter.
std::vector<double> levenberg_marquardt(
    const std::function<void(const std::vector<double>&,
                             std::vector<double>&)>& residuals,
    std::vector<double> x, int m, int max_iter = 100,
    double tol = 1e-10);

}  // namespace lineengine
