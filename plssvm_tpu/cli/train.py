"""plssvm-train equivalent: fit an LS-SVM and write the model file.

reference: src/main_train.cpp:24-70 + src/plssvm/detail/cmd/parser_train.cpp.
Usage: ``python -m plssvm_tpu.cli.train [options] training_set_file [model_file]``
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

from ..csvm import CSVM
from ..data_set import DataSet
from ..exceptions import PLSSVMError
from ..parameter import KernelFunctionType
from ..utils.logger import VerbosityLevel, log
from ..utils.tracker import add_tracking_entry, global_tracker
from .common import (
    add_common_options,
    add_sycl_compat_options,
    warn_ignored_sycl_options,
    resolve_dtype,
    resolve_label_type,
    resolve_verbosity,
)


def build_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(
        prog="plssvm-train",
        description="LS-SVM trainer (TPU-native, JAX/XLA/Pallas)",
    )
    parser.add_argument(
        "-t", "--kernel_type", default="0",
        help="set type of kernel function.\n"
        " 0 -- linear: u'*v\n"
        " 1 -- polynomial: (gamma*u'*v + coef0)^degree\n"
        " 2 -- radial basis function: exp(-gamma*|u-v|^2)\n"
        " 3 -- sigmoid: tanh(gamma*u'*v + coef0)\n"
        " 4 -- laplacian: exp(-gamma*|u-v|_1)\n"
        " 5 -- chi-squared: exp(-gamma*sum((x-y)^2/(x+y)))",
    )
    parser.add_argument("-d", "--degree", type=int, default=None,
                        help="set degree in kernel function")
    parser.add_argument("-g", "--gamma", type=float, default=None,
                        help="set gamma in kernel function (default: 1 / num_features)")
    parser.add_argument("-r", "--coef0", type=float, default=None,
                        help="set coef0 in kernel function")
    parser.add_argument("-c", "--cost", type=float, default=None,
                        help="set the parameter C")
    parser.add_argument("-e", "--epsilon", type=float, default=0.001,
                        help="set the tolerance of termination criterion")
    parser.add_argument("-i", "--max_iter", type=int, default=None,
                        help="set the maximum number of CG iterations (default: num_data_points)")
    parser.add_argument("-b", "--backend", default="automatic",
                        help="choose the backend: automatic|xla|pallas")
    parser.add_argument("-p", "--target_platform", default="automatic",
                        help="choose the target platform: automatic|cpu|tpu")
    parser.add_argument(
        "-s", "--svm_type", default="c_svc",
        choices=["c_svc", "epsilon_svr", "svr", "one_class"],
        help="c_svc = classification (default); epsilon_svr/svr = "
             "least-squares REGRESSION on continuous targets (LS-SVR, an "
             "extension — same linear system, squared loss; the model file "
             "uses LIBSVM's epsilon_svr layout)",
    )
    parser.add_argument(
        "--classification", default="oaa", choices=["oaa", "oao"],
        help="multiclass decomposition (> 2 labels; upstream PLSSVM v3 "
             "parity): oaa = one-vs-all block CG sharing the Gram work "
             "(default), oao = one-vs-one pair machines stored in the "
             "standard LIBSVM multiclass model layout",
    )
    parser.add_argument(
        "--probability", action="store_true",
        help="train a probability model (like svm-train -b 1; -b is taken "
             "by --backend here): Platt-sigmoid calibration on "
             "stratified-5-fold CV decision values (classification, "
             "probA/probB header lines) or the Laplace noise scale of the "
             "CV residuals (regression, a lone probA line)",
    )
    parser.add_argument("--solver", default="automatic",
                        choices=["automatic", "cg_explicit", "cg_implicit"],
                        help="CG solver type (upstream PLSSVM v3 parity): "
                        "cg_implicit recomputes the kernel matrix every "
                        "iteration (any problem size); cg_explicit "
                        "materializes it once on device — faster for wide "
                        "feature axes and for laplacian/chi-squared, bounded "
                        "by device memory; automatic picks per fit")
    parser.add_argument("--preconditioner", default="none",
                        choices=["none", "jacobi"],
                        help="CG preconditioner; 'jacobi' can cut iterations "
                        "on ill-conditioned problems (default: none)")
    parser.add_argument("--gram_precision", default="f32",
                        choices=["f32", "bf16", "highest"],
                        help="Gram contraction precision on the TPU kernels: "
                        "f32 = single-pass MXU (default), bf16 = + bfloat16 "
                        "operand storage (half the HBM traffic), highest = "
                        "multi-pass full-f32 dots (reference-grade accuracy "
                        "at ~1/3 the rate); the convergence-deciding exact "
                        "residuals always run at full precision")
    parser.add_argument("--debug", action="store_true",
                        help="enable checkify NaN/Inf guards on the CG "
                        "state: a numeric blowup aborts with the failing "
                        "iteration instead of silently converging to a "
                        "garbage model (every solver tier incl. meshes "
                        "and --multihost)")
    parser.add_argument("--profile", metavar="DIR", default=None,
                        help="write a jax.profiler trace of the fit to DIR "
                        "(view with TensorBoard / xprof)")
    parser.add_argument(
        "--cross_validation", metavar="N", type=int, default=None,
        help="N-fold cross-validation mode (svm-train's -v n; -v is taken "
             "by --version here): prints the CV accuracy (classification) "
             "or MSE + squared correlation coefficient (regression) and "
             "exits WITHOUT writing a model file",
    )
    parser.add_argument(
        "--weight", metavar="LABEL=W", action="append", default=None,
        help="per-class regularization weight (repeatable; LIBSVM's -wi): "
             "class LABEL's diagonal regularizer becomes 1/(C*W) — Suykens' "
             "weighted LS-SVM for class imbalance",
    )
    parser.add_argument("--warm_start", metavar="MODEL_FILE", default=None,
                        help="warm-start CG from an existing model file's "
                        "alpha (same data set; binary/one-vs-all only) — "
                        "refine a converged model at a tighter -e or after "
                        "a -c change without solving from scratch")
    parser.add_argument(
        "-n", "--nu", type=float, default=0.5,
        help="one-class training outlier fraction (svm-train's -n for "
             "-s one_class): rho is the nu-quantile of the training "
             "scores, so ~nu of the training points land outside",
    )
    parser.add_argument(
        "--max_sv", metavar="N", type=int, default=None,
        help="sparse model (Suykens' pruning): after training, iteratively "
             "drop the smallest-|alpha| support vectors and refit "
             "(warm-started) until at most N remain — the model file "
             "stores only the N survivors",
    )
    parser.add_argument(
        "--nystroem", metavar="M", type=int, default=None,
        help="fixed-size LS-SVM: direct primal fit in an M-landmark "
             "Nystroem basis — the model stores only the M landmarks and "
             "training streams the data once in row blocks (O(M^2) device "
             "memory, any n)",
    )
    parser.add_argument(
        "--streaming", action="store_true",
        help="with --nystroem: train STRAIGHT FROM the file in two "
             "windowed native-parse passes (landmark gather, then the "
             "normal-equation reduction) — host memory stays "
             "O(window * d + M * d + n) at any n, so files larger than "
             "host RAM train",
    )
    parser.add_argument("--checkpoint", metavar="FILE", default=None,
                        help="CG-state checkpoint file: training state is saved "
                        "every --checkpoint_interval iterations and an "
                        "interrupted run resumes from it automatically")
    parser.add_argument(
        "--multihost", action="store_true",
        help="multi-host training: initialize the JAX process group, parse "
             "only this host's row window of the training file and solve "
             "row-sharded over the global device mesh",
    )
    parser.add_argument("--checkpoint_interval", type=int, default=1000,
                        help="iterations between CG-state checkpoints")
    add_sycl_compat_options(parser)
    add_common_options(parser)
    parser.add_argument("input", metavar="training_set_file")
    parser.add_argument("model", metavar="model_file", nargs="?", default=None)
    return parser


def _format_params(args, kernel: KernelFunctionType, model_filename: str) -> str:
    """The 'task: training' parameter dump printed at full verbosity.

    reference: src/plssvm/detail/cmd/parser_train.cpp:234-271 (operator<<).
    """
    lines = [f"kernel_type: {kernel} -> {kernel.math_string}"]
    if kernel == KernelFunctionType.POLYNOMIAL:
        lines.append(
            "gamma: 1 / num_features (default)" if args.gamma is None
            else f"gamma: {args.gamma}"
        )
        lines.append(
            f"coef0: {args.coef0 if args.coef0 is not None else 0.0}"
            f"{' (default)' if args.coef0 is None else ''}"
        )
        lines.append(
            f"degree: {args.degree if args.degree is not None else 3}"
            f"{' (default)' if args.degree is None else ''}"
        )
    elif kernel == KernelFunctionType.SIGMOID:
        lines.append(
            "gamma: 1 / num_features (default)" if args.gamma is None
            else f"gamma: {args.gamma}"
        )
        lines.append(
            f"coef0: {args.coef0 if args.coef0 is not None else 0.0}"
            f"{' (default)' if args.coef0 is None else ''}"
        )
    elif kernel in (
        KernelFunctionType.RBF,
        KernelFunctionType.LAPLACIAN,
        KernelFunctionType.CHI_SQUARED,
    ):
        lines.append(
            "gamma: 1 / num_features (default)" if args.gamma is None
            else f"gamma: {args.gamma}"
        )
    lines.append(
        f"cost: {args.cost if args.cost is not None else 1.0}"
        f"{' (default)' if args.cost is None else ''}"
    )
    lines.append(f"epsilon: {args.epsilon}")
    lines.append(
        "max_iter: num_data_points (default)" if args.max_iter is None
        else f"max_iter: {args.max_iter}"
    )
    lines.append(
        f"label_type: {'str' if args.use_strings_as_labels else 'int (default)'}"
    )
    lines.append(
        "real_type: float64"
        if args.use_double_as_real_type
        else "real_type: float32 (default)"
    )
    lines.append(f"input file (data set): '{args.input}'")
    lines.append(f"output file (model): '{model_filename}'")
    if args.performance_tracking:
        lines.append(f"performance tracking file: '{args.performance_tracking}'")
    return "\n".join(lines)


def _expand_class_weights(per_class_weights, labels_arr) -> np.ndarray:
    """-wi per-class weights -> the per-point sample_weight vector.

    LIBSVM prints a warning for a -wi label matching no training class;
    unlisted classes get weight 1.0 (libsvm's -wi semantics).
    """
    present = {str(lab) for lab in labels_arr}
    for lab in per_class_weights:
        if lab not in present:
            print(
                f"WARNING: class label {lab} specified in "
                "weight is not found",
                file=sys.stderr,
            )
    return np.asarray(
        [per_class_weights.get(str(lab), 1.0) for lab in labels_arr],
        dtype=np.float64,
    )


def _read_label_column(filename: str):
    """The full label column of a training file (metadata-scale read).

    Uses the same windowed native readers the multihost ingest uses
    (zero-row window = labels + shape only, no feature materialization);
    falls back to the Python parsers.  None for unlabeled files.
    """
    if filename.lower().endswith(".arff"):
        from ..io.arff import parse_arff_file, parse_arff_file_window

        meta = parse_arff_file_window(filename, 0, 0)
        if meta is not None:
            return meta[1]
        return parse_arff_file(filename)[1]
    from ..native.loader import parse_libsvm_native_window

    meta = parse_libsvm_native_window(filename, 0, 0)
    if meta is not None:
        return meta[1]
    from ..io.libsvm import parse_libsvm_file

    return parse_libsvm_file(filename)[1]


def main(argv=None) -> int:
    parser = build_parser()
    args = parser.parse_args(argv)
    resolve_verbosity(args)
    warn_ignored_sycl_options(args)

    if args.gamma is not None and args.gamma <= 0.0:
        print(f"gamma must be greater than 0.0, but is {args.gamma}!", file=sys.stderr)
        return 1
    if args.max_iter is not None and args.max_iter <= 0:
        print(f"max_iter must be greater than 0, but is {args.max_iter}!", file=sys.stderr)
        return 1

    model_filename = args.model
    if model_filename is None:
        # default model filename: <input basename>.model (parser_train.cpp:218-221)
        model_filename = os.path.basename(args.input) + ".model"

    start = time.perf_counter()
    try:
        kernel = KernelFunctionType.from_string(args.kernel_type)
        log(
            VerbosityLevel.FULL,
            "\ntask: training\n{}\n\n",
            _format_params(args, kernel, model_filename),
        )
        svm_kwargs = dict(
            backend=args.backend,
            target=args.target_platform,
            dtype=resolve_dtype(args),
            preconditioner=args.preconditioner,
            gram_precision=args.gram_precision,
            solver=args.solver,
            debug=args.debug,
            kernel_type=kernel,
            degree=args.degree,
            gamma=args.gamma,
            coef0=args.coef0,
            cost=args.cost,
        )
        add_tracking_entry("parameter", "kernel_type", str(kernel))
        add_tracking_entry("parameter", "epsilon", args.epsilon)
        fit_kwargs = dict(
            epsilon=args.epsilon, max_iter=args.max_iter,
            classification=args.classification,
        )
        per_class_weights = None
        if args.weight:
            if args.svm_type != "c_svc":
                print(
                    "--weight is only supported for classification "
                    "training!",
                    file=sys.stderr,
                )
                return 1
            per_class_weights = {}
            for spec in args.weight:
                if "=" not in spec:
                    print(
                        f"--weight expects LABEL=W, got '{spec}'!",
                        file=sys.stderr,
                    )
                    return 1
                lab, w = spec.split("=", 1)
                try:
                    weight_value = float(w)
                except ValueError:
                    print(
                        f"--weight expects a numeric W, got '{w}'!",
                        file=sys.stderr,
                    )
                    return 1
                if weight_value <= 0.0:
                    # LIBSVM requires -wi weight > 0; w=0 would produce an
                    # inf per-point regularizer and a silent NaN model
                    print(
                        f"--weight values must be positive, got "
                        f"{weight_value}!",
                        file=sys.stderr,
                    )
                    return 1
                per_class_weights[lab.strip()] = weight_value
        if args.probability and args.multihost:
            # reject BEFORE building the multihost CSVM — constructing it
            # on a pod initializes (and blocks on) the process group
            print(
                "--probability is not supported together with --multihost "
                "(the cross-validation fits are single-host)!",
                file=sys.stderr,
            )
            return 1
        if args.cross_validation is not None and args.multihost:
            # same construct-after-validate rule as --probability above
            print(
                "--cross_validation is not supported together with "
                "--multihost!",
                file=sys.stderr,
            )
            return 1
        if args.max_sv is not None or args.nystroem is not None:
            which = "--max_sv" if args.max_sv is not None else "--nystroem"
            if args.max_sv is not None and args.nystroem is not None:
                print(
                    "--max_sv and --nystroem are mutually exclusive!",
                    file=sys.stderr,
                )
                return 1
            rejects = [
                (args.warm_start, "--warm_start"),
                (args.checkpoint, "--checkpoint"),
            ]
            # (--cross_validation COMPOSES: the CV folds train with the
            # same compact procedure via sparse.compact_fold_fit_fn, so
            # the reported accuracy reflects the deployed compact model)
            if args.max_sv is not None or args.svm_type == "one_class":
                # pruning needs iterative full refits (single-host), and
                # the one-class compact fits have no multihost variant;
                # --nystroem --multihost composes (nystroem_fit_multihost)
                rejects.append((args.multihost, "--multihost"))
            for flag, name in rejects:
                if flag:
                    print(
                        f"{which} is not supported together with {name}!",
                        file=sys.stderr,
                    )
                    return 1
            if str(args.classification).lower() == "oao":
                print(
                    f"{which} supports binary/one-vs-all training only "
                    "(--classification oaa)!",
                    file=sys.stderr,
                )
                return 1
            value = args.max_sv if args.max_sv is not None else args.nystroem
            if value < 1:
                print(
                    f"{which} must be at least 1!",
                    file=sys.stderr,
                )
                return 1
        if args.streaming:
            if args.nystroem is None:
                print("--streaming requires --nystroem!", file=sys.stderr)
                return 1
            if args.multihost:
                # the multihost ingest IS windowed; accepting --streaming
                # would silently drop it
                print(
                    "--streaming is not supported together with "
                    "--multihost (the multihost ingest is already "
                    "windowed per host)!",
                    file=sys.stderr,
                )
                return 1
            if args.probability:
                # calibration needs CV refits over the materialized data,
                # which --streaming never loads
                print(
                    "--streaming is not supported together with "
                    "--probability!",
                    file=sys.stderr,
                )
                return 1
            if args.weight:
                print(
                    "--streaming is not supported together with --weight!",
                    file=sys.stderr,
                )
                return 1
            if args.cross_validation:
                # CV folds need the materialized data --streaming never
                # loads
                print(
                    "--streaming is not supported together with "
                    "--cross_validation!",
                    file=sys.stderr,
                )
                return 1
        if args.svm_type == "one_class":
            if not 0.0 < args.nu < 1.0:
                print(
                    f"nu must be in (0, 1), but is {args.nu}!",
                    file=sys.stderr,
                )
                return 1
            # one-class COMPOSES with --max_sv/--nystroem (compact novelty
            # models, sparse.py) and --multihost (windowed per-host ingest,
            # one_class.fit_one_class_multihost)
            # --checkpoint also COMPOSES (one-class CG-state
            # checkpointing, one_class._run_ridge_segments)
            for flag, name in (
                (args.cross_validation, "--cross_validation"),
                (args.probability, "--probability"),
                (args.weight, "--weight"),
            ):
                if flag:
                    print(
                        f"-s one_class is not supported together with "
                        f"{name}!",
                        file=sys.stderr,
                    )
                    return 1
            # (--warm_start composes: fit_one_class(initial_model=) warm-
            # starts single- and multi-device refits; the compact and
            # multihost combinations are rejected below/above)
            # (--multihost with --max_sv/--nystroem is already rejected by
            # the generic compact-flag block above; --multihost --checkpoint
            # composes via fit_one_class_multihost(checkpoint_path=))
        if args.warm_start is not None:
            from ..model import Model

            fit_kwargs["initial_model"] = Model.load(
                args.warm_start, label_type=resolve_label_type(args),
                dtype=resolve_dtype(args),
            )
        if args.checkpoint is not None:
            fit_kwargs["checkpoint_path"] = args.checkpoint
            fit_kwargs["checkpoint_interval"] = args.checkpoint_interval
        if args.multihost:
            # the process group MUST come up before anything touches the
            # XLA backend — CSVM.__init__ calls jax.devices(), and
            # jax.distributed.initialize after that is unrecoverable on a
            # pod (multihost.py:64-124; predict.py uses the same order)
            from ..parallel.multihost import initialize_distributed

            initialize_distributed()
            svm = CSVM(devices="all", **svm_kwargs)

            if per_class_weights is not None:
                # expand -wi per-class weights into the per-point vector
                # fit_multihost takes: the label column is metadata-scale
                # and comes from the same windowed readers the fit uses
                labels_all = _read_label_column(args.input)
                if labels_all is None:
                    print(
                        "--weight with --multihost needs a labeled "
                        "training file!",
                        file=sys.stderr,
                    )
                    return 1
                # the windowed reader returns RAW label strings; infer
                # like DataSet does so '+1'-style labels match the same
                # --weight keys as the single-host path
                from ..data_set import _infer_label_array

                labels_all = _infer_label_array(
                    list(labels_all), resolve_label_type(args)
                )
                fit_kwargs["sample_weight"] = _expand_class_weights(
                    per_class_weights, np.asarray(labels_all)
                )

            if args.nystroem is not None:
                def run_fit():
                    from ..sparse import nystroem_fit_multihost

                    return nystroem_fit_multihost(
                        svm, args.input, n_landmarks=args.nystroem,
                        label_type=resolve_label_type(args),
                        regression=args.svm_type in ("epsilon_svr", "svr"),
                        sample_weight=fit_kwargs.get("sample_weight"),
                    )
            elif args.svm_type == "one_class":
                def run_fit():
                    from ..one_class import fit_one_class_multihost

                    oc_mh_kwargs = {}
                    if args.checkpoint is not None:
                        oc_mh_kwargs["checkpoint_path"] = args.checkpoint
                        oc_mh_kwargs["checkpoint_interval"] = (
                            args.checkpoint_interval
                        )
                    if "initial_model" in fit_kwargs:
                        oc_mh_kwargs["initial_model"] = (
                            fit_kwargs["initial_model"]
                        )
                    return fit_one_class_multihost(
                        svm, args.input, nu=args.nu,
                        epsilon=args.epsilon, max_iter=args.max_iter,
                        **oc_mh_kwargs,
                    )
            else:
                def run_fit():
                    return svm.fit_multihost(
                        args.input, label_type=resolve_label_type(args),
                        regression=args.svm_type in ("epsilon_svr", "svr"),
                        **fit_kwargs,
                    )
        else:
            regression = args.svm_type in ("epsilon_svr", "svr")
            one_class = args.svm_type == "one_class"
            # --streaming never materializes the data set on the host —
            # nystroem_fit_from_file parses windows straight off the file
            data = None if args.streaming else DataSet(
                args.input,
                # one-class files may carry a single label class (or none);
                # load label-mapping-free — the labels are ignored anyway
                label_type=(
                    float if (regression or one_class)
                    else resolve_label_type(args)
                ),
                dtype=resolve_dtype(args),
                regression=regression or one_class,
            )
            svm = CSVM(**svm_kwargs)
            if per_class_weights is not None:
                fit_kwargs["sample_weight"] = _expand_class_weights(
                    per_class_weights, np.asarray(data.labels)
                )

            if (
                args.max_sv is not None
                and not regression
                and not one_class
                and data.has_labels()
                and args.max_sv < data.num_different_labels
            ):
                # mirror sparse.pruned_fit's class-floor validation before
                # any (expensive) initial fit happens
                print(
                    f"--max_sv ({args.max_sv}) must be at least the number "
                    f"of classes ({data.num_different_labels})!",
                    file=sys.stderr,
                )
                return 1

            def run_fit():
                if args.streaming:
                    if one_class:
                        from ..sparse import (
                            nystroem_fit_one_class_from_file,
                        )

                        return nystroem_fit_one_class_from_file(
                            svm, args.input,
                            n_landmarks=args.nystroem, nu=args.nu,
                        )
                    from ..sparse import nystroem_fit_from_file

                    return nystroem_fit_from_file(
                        svm, args.input, n_landmarks=args.nystroem,
                        label_type=resolve_label_type(args),
                        regression=regression,
                    )
                if one_class:
                    if args.nystroem is not None:
                        from ..sparse import nystroem_fit_one_class

                        return nystroem_fit_one_class(
                            svm, data, n_landmarks=args.nystroem, nu=args.nu,
                        )
                    if args.max_sv is not None:
                        from ..sparse import pruned_fit_one_class

                        return pruned_fit_one_class(
                            svm, data, n_sv=args.max_sv, nu=args.nu,
                            epsilon=args.epsilon, max_iter=args.max_iter,
                        )
                    from ..one_class import fit_one_class

                    oc_kwargs = {}
                    if args.checkpoint is not None:
                        oc_kwargs["checkpoint_path"] = args.checkpoint
                        oc_kwargs["checkpoint_interval"] = (
                            args.checkpoint_interval
                        )
                    if "initial_model" in fit_kwargs:
                        oc_kwargs["initial_model"] = (
                            fit_kwargs["initial_model"]
                        )
                    return fit_one_class(
                        svm, data, nu=args.nu,
                        epsilon=args.epsilon, max_iter=args.max_iter,
                        **oc_kwargs,
                    )
                if args.nystroem is not None:
                    from ..sparse import nystroem_fit

                    return nystroem_fit(
                        svm, data, n_landmarks=args.nystroem,
                        sample_weight=fit_kwargs.get("sample_weight"),
                    )
                if args.max_sv is not None:
                    from ..sparse import pruned_fit

                    return pruned_fit(
                        svm, data, n_sv=args.max_sv,
                        epsilon=args.epsilon, max_iter=args.max_iter,
                        sample_weight=fit_kwargs.get("sample_weight"),
                    )
                return svm.fit(data, **fit_kwargs)

        if args.cross_validation is not None:
            # svm-train -v mode: report CV metrics, write no model
            for flag, name in (
                (args.multihost, "--multihost"),
                (args.probability, "--probability"),
                (args.warm_start, "--warm_start"),
                (args.checkpoint, "--checkpoint"),
                (args.profile, "--profile"),
            ):
                if flag:
                    print(
                        f"--cross_validation is not supported together "
                        f"with {name}!",
                        file=sys.stderr,
                    )
                    return 1
            if args.cross_validation < 2:
                print(
                    f"n-fold cross validation: n must >= 2, but is "
                    f"{args.cross_validation}!",
                    file=sys.stderr,
                )
                return 1
            from ..probability import cross_validate

            cv_fit_fn = None
            if args.max_sv is not None or args.nystroem is not None:
                from ..sparse import compact_fold_fit_fn

                cv_fit_fn = compact_fold_fit_fn(
                    svm, n_landmarks=args.nystroem, max_sv=args.max_sv,
                    epsilon=args.epsilon, max_iter=args.max_iter,
                )
            result = cross_validate(
                svm, data,
                n_folds=args.cross_validation,
                epsilon=args.epsilon, max_iter=args.max_iter,
                classification=args.classification,
                sample_weight=fit_kwargs.get("sample_weight"),
                fit_fn=cv_fit_fn,
            )
            if "accuracy" in result:
                log(
                    VerbosityLevel.FULL | VerbosityLevel.LIBSVM,
                    "Cross Validation Accuracy = {}%\n",
                    result["accuracy"] * 100.0,
                )
            else:
                log(
                    VerbosityLevel.FULL | VerbosityLevel.LIBSVM,
                    "Cross Validation Mean squared error = {}\n"
                    "Cross Validation Squared correlation coefficient = {}\n",
                    result["mse"], result["scc"],
                )
            if args.performance_tracking is not None:
                add_tracking_entry(
                    "", "total_time", (time.perf_counter() - start) * 1000.0
                )
                global_tracker.save(args.performance_tracking)
            return 0

        if args.profile is not None:
            import jax

            with jax.profiler.trace(args.profile):
                model = run_fit()
        else:
            model = run_fit()
        if args.probability:
            from ..probability import calibrate_model

            fit_fn = None
            if args.nystroem is not None or args.max_sv is not None:
                # compact fits calibrate on COMPACT CV folds — the ONE
                # rule shared with the sklearn facade
                from ..sparse import compact_fold_fit_fn

                fit_fn = compact_fold_fit_fn(
                    svm, n_landmarks=args.nystroem, max_sv=args.max_sv,
                    epsilon=args.epsilon, max_iter=args.max_iter,
                )
            calibrate_model(
                svm, model, data,
                epsilon=args.epsilon, max_iter=args.max_iter,
                # keep the -wi weights in the CV subproblems, as LIBSVM's
                # svm_binary_svc_probability does
                sample_weight=fit_kwargs.get("sample_weight"),
                fit_fn=fit_fn,
            )
        # multihost: exactly ONE process writes the (shared-storage) model
        # file — every host holds the identical model, and concurrent
        # buffered writes to one path would interleave (same rule as the
        # checkpoint writes, parallel/multihost.py:311-319)
        if not args.multihost or _process_index() == 0:
            model.save(model_filename)
    except PLSSVMError as exc:
        print(exc, file=sys.stderr)
        return 1
    except Exception as exc:
        # --debug numeric guard (checkify.JaxRuntimeError): report the
        # located failure cleanly instead of a JAX traceback
        from jax.experimental.checkify import JaxRuntimeError

        if isinstance(exc, JaxRuntimeError):
            print(f"numeric check failed: {exc}", file=sys.stderr)
            return 1
        raise

    total_ms = (time.perf_counter() - start) * 1000.0
    log(VerbosityLevel.FULL | VerbosityLevel.TIMING, "\nTotal runtime: {:.2f}ms\n", total_ms)
    add_tracking_entry("", "total_time", total_ms)
    if args.performance_tracking is not None and (
        not args.multihost or _process_index() == 0
    ):
        global_tracker.save(args.performance_tracking)
    return 0


def _process_index() -> int:
    """jax.process_index(), imported lazily (the CLI parses/validates
    before touching the JAX backend)."""
    import jax

    return jax.process_index()


if __name__ == "__main__":
    sys.exit(main())
