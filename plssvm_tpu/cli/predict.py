"""plssvm-predict equivalent: predict labels with a trained model file.

reference: src/main_predict.cpp:29-103 + detail/cmd/parser_predict.cpp.
Usage: ``python -m plssvm_tpu.cli.predict [options] test_file model_file [output_file]``
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
from ..model import Model
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
        prog="plssvm-predict",
        description="LS-SVM prediction (TPU-native, JAX/XLA/Pallas)",
    )
    parser.add_argument("-b", "--backend", default="automatic",
                        help="choose the backend: automatic|xla|pallas")
    parser.add_argument("-p", "--target_platform", default="automatic",
                        help="choose the target platform: automatic|cpu|tpu")
    parser.add_argument(
        "--probability", action="store_true",
        help="output class probabilities in LIBSVM's svm-predict -b 1 "
             "format ('labels ...' header, then 'label P(c1) P(c2) ...' per "
             "point); requires a model trained with probability calibration "
             "(plssvm-train --probability)",
    )
    parser.add_argument(
        "--multihost", action="store_true",
        help="multi-host prediction over all hosts in the job: each host "
             "reads and scores only its row block of the test file "
             "(windowed native parse); process 0 writes the output file",
    )
    add_sycl_compat_options(parser)
    add_common_options(parser)
    parser.add_argument("test", metavar="test_file")
    parser.add_argument("model", metavar="model_file")
    parser.add_argument("output", metavar="output_file", nargs="?", default=None)
    return parser


def _main_multihost(args, predict_filename: str, start: float) -> int:
    """--multihost prediction: windowed per-host scoring over the job's
    hosts (parallel.multihost.predict_multihost); process 0 writes the
    output file and prints the accuracy/regression metrics."""
    import jax

    from ..data_set import _infer_label_array
    from ..parallel.multihost import initialize_distributed, predict_multihost

    initialize_distributed()
    model = Model.load(
        args.model,
        label_type=resolve_label_type(args),
        dtype=resolve_dtype(args),
    )
    svm = CSVM(
        backend=args.backend, target=args.target_platform,
        dtype=resolve_dtype(args), devices="all",
    )
    predicted, raw_labels, n = predict_multihost(svm, model, args.test)
    is_writer = jax.process_index() == 0

    if is_writer:
        write_start = time.perf_counter()
        with open(predict_filename, "w", encoding="utf-8") as fh:
            # one value per line, trailing '\n' (main_predict.cpp:53-84)
            if model.is_regression:
                for v in predicted:
                    fh.write(format(v, ".10g") + "\n")
            else:
                for lab in predicted:
                    fh.write(str(lab) + "\n")
        write_ms = (time.perf_counter() - write_start) * 1000.0
        log(
            VerbosityLevel.FULL | VerbosityLevel.TIMING,
            "Write {} predictions in {:.2f}ms to the file '{}'.\n",
            len(predicted), write_ms, predict_filename,
        )

    if raw_labels is not None and is_writer:
        if model.is_regression:
            targets = np.asarray(
                _infer_label_array(list(raw_labels), float),
                dtype=np.float64,
            )
            values = np.asarray(predicted, dtype=np.float64)
            mse = float(np.mean((values - targets) ** 2))
            vt = targets - targets.mean()
            vv = values - values.mean()
            denom = float(np.sum(vt * vt) * np.sum(vv * vv))
            scc = (
                float(np.sum(vt * vv)) ** 2 / denom if denom > 0 else 0.0
            )
            log(
                VerbosityLevel.FULL | VerbosityLevel.LIBSVM,
                "Mean squared error = {} (regression)\n"
                "Squared correlation coefficient = {} (regression)\n",
                mse, scc,
            )
        else:
            if getattr(model, "is_one_class", False):
                targets = _infer_label_array(list(raw_labels), int)
            else:
                targets = _infer_label_array(
                    list(raw_labels), resolve_label_type(args)
                )
            correct = int(
                np.sum(np.asarray(predicted) == np.asarray(targets))
            )
            log(
                VerbosityLevel.FULL | VerbosityLevel.LIBSVM,
                "Accuracy = {}% ({}/{}) (classification)\n",
                correct / n * 100.0, correct, n,
            )

    total_ms = (time.perf_counter() - start) * 1000.0
    log(
        VerbosityLevel.FULL | VerbosityLevel.TIMING,
        "\nTotal runtime: {:.2f}ms\n", total_ms,
    )
    if args.performance_tracking is not None and is_writer:
        add_tracking_entry("", "total_time", total_ms)
        global_tracker.save(args.performance_tracking)
    return 0


def main(argv=None) -> int:
    parser = build_parser()
    args = parser.parse_args(argv)
    resolve_verbosity(args)
    warn_ignored_sycl_options(args)

    predict_filename = args.output
    if predict_filename is None:
        # default: <test basename>.predict (parser_predict.cpp:156-159)
        predict_filename = os.path.basename(args.test) + ".predict"

    # reference: src/main_predict.cpp:38 + parser_predict.cpp operator<<
    log(
        VerbosityLevel.FULL,
        "\ntask: prediction\n"
        "label_type: {}\n"
        "real_type: {}\n"
        "input file (data set): '{}'\n"
        "input file (model): '{}'\n"
        "output file (prediction): '{}'\n\n",
        "str" if args.use_strings_as_labels else "int (default)",
        "float64" if args.use_double_as_real_type else "float32 (default)",
        args.test, args.model, predict_filename,
    )

    if args.multihost and args.probability:
        print(
            "--probability is not supported together with --multihost!",
            file=sys.stderr,
        )
        return 1

    start = time.perf_counter()
    if args.multihost:
        try:
            return _main_multihost(args, predict_filename, start)
        except PLSSVMError as exc:
            print(exc, file=sys.stderr)
            return 1
    try:
        model = Model.load(
            args.model,
            label_type=resolve_label_type(args),
            dtype=resolve_dtype(args),
        )
        data = DataSet(
            args.test,
            label_type=resolve_label_type(args),
            dtype=resolve_dtype(args),
            # regression/one-class test files bypass the >=2-classes
            # label mapping: SVR targets are continuous (a classification
            # LabelMapper over n distinct values would do O(n^2) work and
            # reject constant placeholder labels), and a one-class file
            # may carry a single label class (+1) or none at all
            regression=(
                getattr(model, "is_regression", False)
                or getattr(model, "is_one_class", False)
            ),
        )
        svm = CSVM(
            backend=args.backend,
            target=args.target_platform,
            dtype=resolve_dtype(args),
        )
        probabilities = None
        if args.probability and model.is_regression:
            # libsvm's svm-predict -b 1 on SVR models: plain predicted
            # values, plus the Laplace noise model line
            if getattr(model, "prob_a", None) is None:
                print(
                    "Model does not support probability estimates — train "
                    "with plssvm-train --probability!",
                    file=sys.stderr,
                )
                return 1
            log(
                VerbosityLevel.FULL | VerbosityLevel.LIBSVM,
                "Prob. model for test data: target value = predicted value "
                "+ z,\nz: Laplace distribution e^(-|z|/sigma)/(2sigma), "
                "sigma={}\n",
                float(model.prob_a[0]),
            )
            predicted = svm.predict(model, data)
        elif args.probability:
            if getattr(model, "prob_a", None) is None:
                print(
                    "Model does not support probability estimates — train "
                    "with plssvm-train --probability!",
                    file=sys.stderr,
                )
                return 1
            from ..probability import predict_probabilities

            values = svm.predict_values(model, data)
            probabilities = predict_probabilities(model, values)
            # LIBSVM convention: the -b 1 prediction is the argmax of the
            # calibrated probabilities (may differ from sign(f) near 0.5).
            # predict_probabilities emits SORTED label columns (the
            # library-wide convention); the output FILE below reorders to
            # the model's label-header order like svm-predict
            sorted_classes = np.asarray(model.data.different_labels)
            predicted = sorted_classes[np.argmax(probabilities, axis=1)]
        else:
            predicted = svm.predict(model, data)
    except PLSSVMError as exc:
        print(exc, file=sys.stderr)
        return 1

    write_start = time.perf_counter()
    with open(predict_filename, "w", encoding="utf-8") as fh:
        if model.is_regression:
            # one predicted value per line (svm-predict's regression output),
            # each terminated by '\n' (src/main_predict.cpp:53-84 writes
            # `label << '\n'` per point — the file ends with a newline)
            for v in predicted:
                fh.write(format(v, ".10g") + "\n")
        elif probabilities is None:
            for lab in predicted:
                fh.write(str(lab) + "\n")
        else:
            # svm-predict -b 1 format: 'labels <classes>' header, then one
            # 'label P(c1) P(c2) ...' line per point in header class order
            # (predict_probabilities emits SORTED columns — reorder)
            layout = [str(c) for c in model.class_order()]
            sorted_labels = [str(c) for c in model.data.different_labels]
            perm = [sorted_labels.index(c) for c in layout]
            fh.write(
                "labels " + " ".join(str(c) for c in model.class_order())
                + "\n"
            )
            for lab, row in zip(predicted, probabilities):
                fh.write(
                    str(lab) + " "
                    + " ".join(format(row[p], ".10g") for p in perm)
                    + "\n"
                )
    write_ms = (time.perf_counter() - write_start) * 1000.0
    log(
        VerbosityLevel.FULL | VerbosityLevel.TIMING,
        "Write {} predictions in {:.2f}ms to the file '{}'.\n",
        len(predicted), write_ms, predict_filename,
    )
    add_tracking_entry("predictions_write", "num_predictions", len(predicted))
    add_tracking_entry("predictions_write", "filename", predict_filename)

    # print achieved accuracy if the test data is labeled (main_predict.cpp:70-85)
    if data.has_labels() and model.is_regression:
        # LIBSVM svm-predict's regression metrics
        targets = np.asarray(data.labels, dtype=np.float64)
        values = np.asarray(predicted, dtype=np.float64)
        mse = float(np.mean((values - targets) ** 2))
        vt = targets - targets.mean()
        vv = values - values.mean()
        denom = float(np.sum(vt * vt) * np.sum(vv * vv))
        scc = float(np.sum(vt * vv)) ** 2 / denom if denom > 0 else 0.0
        log(
            VerbosityLevel.FULL | VerbosityLevel.LIBSVM,
            "Mean squared error = {} (regression)\n"
            "Squared correlation coefficient = {} (regression)\n",
            mse, scc,
        )
    elif data.has_labels():
        correct = int(np.sum(np.asarray(predicted) == np.asarray(data.labels)))
        log(
            VerbosityLevel.FULL | VerbosityLevel.LIBSVM,
            "Accuracy = {}% ({}/{}) (classification)\n",
            correct / data.num_data_points * 100.0,
            correct,
            data.num_data_points,
        )

    total_ms = (time.perf_counter() - start) * 1000.0
    log(VerbosityLevel.FULL | VerbosityLevel.TIMING, "\nTotal runtime: {:.2f}ms\n", total_ms)
    add_tracking_entry("", "total_time", total_ms)
    if args.performance_tracking is not None:
        global_tracker.save(args.performance_tracking)
    return 0


if __name__ == "__main__":
    sys.exit(main())
