"""Matrix-free CG solver for the LS-SVM dual system."""

from .cg import CGResult, solve_ls_svm

__all__ = ["solve_ls_svm", "CGResult"]
