"""Single-threaded NumPy golden implementations of every device op.

Plays the role of the reference's tests/backends/compare.{hpp,cpp}: a
deterministic, obviously-correct implementation of kernel_function /
generate_q / calculate_w / the implicit device kernel / the whole solve,
against which the jnp/XLA and Pallas paths are compared.
"""

from __future__ import annotations

import numpy as np


def kernel(u, v, kind, gamma=1.0, coef0=0.0, degree=3):
    """k(u, v) for single vectors (reference: compare.hpp kernel_function)."""
    dot = float(np.dot(u, v))
    if kind == "linear":
        return dot
    if kind == "polynomial":
        return (gamma * dot + coef0) ** degree
    if kind == "rbf":
        diff = np.asarray(u) - np.asarray(v)
        return float(np.exp(-gamma * np.dot(diff, diff)))
    raise ValueError(kind)


def kernel_matrix(X, kind, gamma=1.0, coef0=0.0, degree=3):
    """Dense K[i, j] = k(x_i, x_j) over all rows."""
    n = X.shape[0]
    K = np.empty((n, n), dtype=X.dtype)
    for i in range(n):
        for j in range(n):
            K[i, j] = kernel(X[i], X[j], kind, gamma, coef0, degree)
    return K


def generate_q(X, kind, gamma=1.0, coef0=0.0, degree=3):
    """q[i] = k(x_i, x_last) for i < n-1 (reference: compare.cpp generate_q)."""
    n = X.shape[0]
    return np.array(
        [kernel(X[i], X[-1], kind, gamma, coef0, degree) for i in range(n - 1)],
        dtype=X.dtype,
    )


def assemble_A_hat(X, cost, kind, gamma=1.0, coef0=0.0, degree=3):
    """The dense implicit matrix A_hat over the dept = n-1 system.

    A_hat[i][j] = k(x_i,x_j) + QA_cost - q[i] - q[j], plus 1/C on the diagonal
    (reference: svm_kernel.cu:68-86).
    """
    n = X.shape[0]
    dept = n - 1
    q = generate_q(X, kind, gamma, coef0, degree)
    QA_cost = kernel(X[-1], X[-1], kind, gamma, coef0, degree) + 1.0 / cost
    K = kernel_matrix(X[:dept], kind, gamma, coef0, degree)
    A = K + QA_cost - q[:, None] - q[None, :]
    A[np.diag_indices(dept)] += 1.0 / cost
    return A, q, QA_cost


def device_kernel(q, d_vec, X, QA_cost, cost, add, kind, gamma=1.0, coef0=0.0, degree=3):
    """ret += add * A_hat @ d (reference: OpenMP/svm_kernel.cpp device_kernel)."""
    A, _, _ = assemble_A_hat(X, cost, kind, gamma, coef0, degree)
    return add * (A @ d_vec)


def solve_dense(X, y, cost=1.0, kind="linear", gamma=1.0, coef0=0.0, degree=3):
    """Direct (non-CG) solve of the LS-SVM dual for validation.

    Returns (alpha_full, rho) with the same postprocessing as the reference
    (OpenMP/csvm.cpp:178-182).
    """
    n = X.shape[0]
    dept = n - 1
    A, q, QA_cost = assemble_A_hat(X, cost, kind, gamma, coef0, degree)
    b = y[:dept] - y[-1]
    x = np.linalg.solve(A, b)
    bias = y[-1] + QA_cost * np.sum(x) - np.dot(q, x)
    alpha = np.concatenate([x, [-np.sum(x)]])
    return alpha, -bias


def calculate_w(support_vectors, alpha):
    """w = sum_i alpha_i sv_i (reference: compare.cpp calculate_w)."""
    return support_vectors.T @ alpha


def predict_values(support_vectors, alpha, rho, points, kind, gamma=1.0, coef0=0.0, degree=3):
    """f(x) = sum_i alpha_i k(sv_i, x) - rho for each point."""
    out = np.empty(points.shape[0], dtype=points.dtype)
    for p in range(points.shape[0]):
        acc = 0.0
        for i in range(support_vectors.shape[0]):
            acc += alpha[i] * kernel(support_vectors[i], points[p], kind, gamma, coef0, degree)
        out[p] = acc - rho
    return out
