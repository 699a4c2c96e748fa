#include "lm.h"

#include <cmath>

namespace lineengine {

namespace {

// solve (A + lambda*diag(A)) d = g for d, A symmetric n x n (Cholesky with
// fallback to diagonal damping)
bool solve_damped(std::vector<double> A, std::vector<double> g,
                  double lambda, int n, std::vector<double>& d) {
    for (int i = 0; i < n; ++i)
        A[i * n + i] += lambda * (A[i * n + i] > 0 ? A[i * n + i] : 1.0);
    // Cholesky
    for (int i = 0; i < n; ++i) {
        for (int j = 0; j <= i; ++j) {
            double s = A[i * n + j];
            for (int k = 0; k < j; ++k) s -= A[i * n + k] * A[j * n + k];
            if (i == j) {
                if (s <= 0) return false;
                A[i * n + i] = std::sqrt(s);
            } else {
                A[i * n + j] = s / A[j * n + j];
            }
        }
    }
    d.assign(n, 0.0);
    for (int i = 0; i < n; ++i) {
        double s = g[i];
        for (int k = 0; k < i; ++k) s -= A[i * n + k] * d[k];
        d[i] = s / A[i * n + i];
    }
    for (int i = n - 1; i >= 0; --i) {
        double s = d[i];
        for (int k = i + 1; k < n; ++k) s -= A[k * n + i] * d[k];
        d[i] = s / A[i * n + i];
    }
    return true;
}

double sq_norm(const std::vector<double>& r) {
    double s = 0;
    for (double v : r) s += v * v;
    return s;
}

}  // namespace

std::vector<double> levenberg_marquardt(
    const std::function<void(const std::vector<double>&,
                             std::vector<double>&)>& residuals,
    std::vector<double> x, int m, int max_iter, double tol) {
    const int n = (int)x.size();
    std::vector<double> r(m), r2(m);
    residuals(x, r);
    double cost = sq_norm(r);
    double lambda = 1e-3;

    std::vector<double> J((size_t)m * n);
    for (int iter = 0; iter < max_iter; ++iter) {
        // forward-difference Jacobian
        for (int j = 0; j < n; ++j) {
            double h = std::max(1e-8, std::fabs(x[j]) * 1e-6);
            std::vector<double> xj = x;
            xj[j] += h;
            residuals(xj, r2);
            for (int i = 0; i < m; ++i)
                J[(size_t)i * n + j] = (r2[i] - r[i]) / h;
        }
        // normal equations: A = J^T J, g = -J^T r
        std::vector<double> A((size_t)n * n, 0.0), g(n, 0.0);
        for (int i = 0; i < m; ++i) {
            for (int a = 0; a < n; ++a) {
                g[a] -= J[(size_t)i * n + a] * r[i];
                for (int b = 0; b <= a; ++b)
                    A[a * n + b] += J[(size_t)i * n + a] * J[(size_t)i * n + b];
            }
        }
        for (int a = 0; a < n; ++a)
            for (int b = a + 1; b < n; ++b) A[a * n + b] = A[b * n + a];

        bool improved = false;
        for (int tries = 0; tries < 10; ++tries) {
            std::vector<double> d;
            if (solve_damped(A, g, lambda, n, d)) {
                std::vector<double> xn = x;
                for (int a = 0; a < n; ++a) xn[a] += d[a];
                residuals(xn, r2);
                double c2 = sq_norm(r2);
                if (c2 < cost) {
                    if (cost - c2 < tol * (1 + cost)) {
                        x = xn;
                        return x;
                    }
                    x = xn;
                    r = r2;
                    cost = c2;
                    lambda = std::max(lambda * 0.3, 1e-12);
                    improved = true;
                    break;
                }
            }
            lambda *= 10;
            if (lambda > 1e12) break;
        }
        if (!improved) break;
    }
    return x;
}

}  // namespace lineengine
