"""Worker process for TRUE multi-process multihost verification.

Launched by ``tests/test_multiprocess.py`` (and by
``__graft_entry__.dryrun_multichip``'s optional multi-process leg) as N
subprocesses, each with its own ``jax.distributed.initialize`` process
group over virtual CPU devices — the code paths that only exist across
real process boundaries (`initialize_distributed` ordering, per-host
windowed ingest disjointness, ``make_array_from_process_local_data`` with
genuinely local shards, process-0 checkpoint gating under real barriers)
execute here in an actual multi-process runtime, which the in-process
8-virtual-device suite cannot do.

Reference seam being exceeded: the reference is a single-process library
whose multi-GPU reduction stages through host memory
(include/plssvm/backends/gpu_csvm.hpp:449-475); it has no multi-host
story at all.

Environment contract (set by the launcher):
  JAX_PLATFORMS=cpu, XLA_FLAGS=--xla_force_host_platform_device_count=K,
  PYTHONPATH with the repo root and WITHOUT the axon plugin site dir.

Each worker writes ``out_p{pid}.json`` + ``out_p{pid}.npz`` into
``--workdir``; the launcher compares them against single-process goldens.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import traceback


class _Interrupt(Exception):
    """Deterministic simulated mid-run interruption (raised on EVERY
    process at the same logical point, so no collective is left half
    entered)."""


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--process-id", type=int, required=True)
    ap.add_argument("--num-processes", type=int, required=True)
    ap.add_argument("--port", required=True)
    ap.add_argument("--workdir", required=True)
    ap.add_argument(
        "--scenarios",
        default="binary,warm,predict,multiclass,oneclass,nystroem,"
        "checkpoint,explicit,regression,arff,oneclass_checkpoint,cli",
        help="comma-separated subset to run (binary is always run first "
        "when predict/warm/checkpoint need its model)",
    )
    args = ap.parse_args()
    pid = args.process_id

    import numpy as np

    # THE ordering rule under test: the process group must come up before
    # anything touches the XLA backend (multihost.py:36-117).
    from plssvm_tpu.parallel.multihost import initialize_distributed

    initialize_distributed(
        coordinator_address=f"localhost:{args.port}",
        num_processes=args.num_processes,
        process_id=pid,
    )

    import jax

    jax.config.update("jax_enable_x64", True)

    import plssvm_tpu as p

    p.set_verbosity("quiet")

    assert jax.process_index() == pid, (jax.process_index(), pid)
    assert jax.process_count() == args.num_processes

    from plssvm_tpu import (
        fit_one_class_multihost,
        nystroem_fit_multihost,
    )
    from plssvm_tpu.native import loader as native_loader
    from plssvm_tpu.parallel import multihost as mh
    from plssvm_tpu.solver import checkpoint as ckpt_mod

    wd = args.workdir
    scen = set(args.scenarios.split(","))
    out: dict = {
        "pid": pid,
        "num_processes": args.num_processes,
        "local_devices": len(jax.local_devices()),
        "global_devices": len(jax.devices()),
        "native": bool(native_loader.native_available()),
    }
    arrays: dict = {}

    f_bin = os.path.join(wd, "train_binary.libsvm")
    f_multi = os.path.join(wd, "train_multi.libsvm")
    f_test = os.path.join(wd, "test_binary.libsvm")
    f_reg = os.path.join(wd, "train_reg.libsvm")
    f_arff = os.path.join(wd, "train_binary.arff")

    # ---- instrument the windowed ingest: record the row spans each
    # process actually reads, to prove per-host disjointness.  Tagged by
    # scenario: the Nystroem fit legitimately reads the M landmark rows
    # on EVERY host (host-identical selection), so only the plain-fit
    # window reads carry the disjointness claim. ----
    ingest_rows: list = []
    current_scenario = {"name": None}
    orig_rows = native_loader.parse_libsvm_native_rows
    line_spans = native_loader.libsvm_line_spans

    def recording_rows(filename, spans, d, dtype=np.float64):
        # map the requested byte spans back to row numbers via the file's
        # own line index (what fit_multihost sliced them from)
        full = line_spans(filename)
        starts = {int(s): i for i, s in enumerate(np.asarray(full[:, 0]))}
        rows = [starts[int(s)] for s in np.asarray(spans[:, 0])]
        ingest_rows.append(
            {
                "file": os.path.basename(filename),
                "scenario": current_scenario["name"],
                "rows": rows,
            }
        )
        return orig_rows(filename, spans, d, dtype=dtype)

    native_loader.parse_libsvm_native_rows = recording_rows

    # ---- instrument checkpoint saves: only process 0 may write ----
    save_calls = {"n": 0}
    orig_save = ckpt_mod.save_checkpoint

    def counting_save(path, ckpt):
        save_calls["n"] += 1
        return orig_save(path, ckpt)

    ckpt_mod.save_checkpoint = counting_save

    model_bin = None
    try:
        if "binary" in scen or scen & {"warm", "predict", "checkpoint"}:
            current_scenario["name"] = "binary"
            svm = p.CSVM(kernel_type="rbf", gamma=0.1, cost=2.0,
                         dtype=np.float64)
            model_bin = svm.fit_multihost(f_bin, epsilon=1e-8)
            arrays["binary_alpha"] = np.asarray(model_bin.alpha)
            out["binary_rho"] = float(model_bin.rho)
            out["binary_iter"] = int(model_bin.n_iter)

        if "warm" in scen:
            current_scenario["name"] = "warm"
            # warm start from the converged model: 0 iterations, and the
            # warm alpha rides make_array_from_process_local_data
            m_warm = svm.fit_multihost(
                f_bin, epsilon=1e-8, initial_model=model_bin
            )
            out["warm_iter"] = int(m_warm.n_iter)
            out["warm_rho"] = float(m_warm.rho)

        if "predict" in scen:
            current_scenario["name"] = "predict"
            pred, labels_all, n = mh.predict_multihost(svm, model_bin, f_test)
            arrays["predictions"] = np.asarray(pred)
            out["predict_n"] = int(n)

        if "multiclass" in scen:
            current_scenario["name"] = "multiclass"
            svm_mc = p.CSVM(kernel_type="rbf", gamma=0.1, cost=2.0,
                            dtype=np.float64)
            m_mc = svm_mc.fit_multihost(f_multi, epsilon=1e-8)
            arrays["multi_alpha"] = np.asarray(m_mc.alpha)
            arrays["multi_rho"] = np.asarray(m_mc.rho, dtype=np.float64)
            out["multi_iter"] = int(m_mc.n_iter)

        if "oneclass" in scen:
            current_scenario["name"] = "oneclass"
            svm_oc = p.CSVM(kernel_type="rbf", gamma=0.1, cost=2.0,
                            dtype=np.float64)
            m_oc = fit_one_class_multihost(
                svm_oc, f_bin, nu=0.2, epsilon=1e-8
            )
            arrays["oneclass_alpha"] = np.asarray(m_oc.alpha)
            out["oneclass_rho"] = float(m_oc.rho)

        if "nystroem" in scen:
            current_scenario["name"] = "nystroem"
            svm_ny = p.CSVM(kernel_type="rbf", gamma=0.1, cost=2.0,
                            dtype=np.float64)
            m_ny, idx = nystroem_fit_multihost(
                svm_ny, f_bin, n_landmarks=64, random_state=0,
                return_indices=True,
            )
            arrays["nystroem_alpha"] = np.asarray(m_ny.alpha)
            arrays["nystroem_idx"] = np.asarray(idx)
            out["nystroem_rho"] = float(m_ny.rho)

        if "explicit" in scen:
            # solver='cg_explicit' across processes: the one-time K build
            # all_gathers X over the GLOBAL mesh (Gloo across hosts), then
            # iterations are local matmuls + an all_gather of the
            # direction — the other solver type's process-boundary path
            current_scenario["name"] = "explicit"
            svm_ex = p.CSVM(kernel_type="rbf", gamma=0.1, cost=2.0,
                            dtype=np.float64, solver="cg_explicit")
            m_ex = svm_ex.fit_multihost(f_bin, epsilon=1e-8)
            arrays["explicit_alpha"] = np.asarray(m_ex.alpha)
            out["explicit_rho"] = float(m_ex.rho)

        if "regression" in scen:
            # LS-SVR rides the binary multihost solve with continuous
            # targets (no label mapping)
            current_scenario["name"] = "regression"
            svm_r = p.CSVM(kernel_type="rbf", gamma=0.1, cost=2.0,
                           dtype=np.float64)
            m_r = svm_r.fit_multihost(f_reg, epsilon=1e-8, regression=True)
            arrays["regression_alpha"] = np.asarray(m_r.alpha)
            out["regression_rho"] = float(m_r.rho)

        if "checkpoint" in scen:
            current_scenario["name"] = "checkpoint"
            ckpt_path = os.path.join(wd, "mp_cg.ckpt")
            svm_ck = p.CSVM(kernel_type="rbf", gamma=0.1, cost=2.0,
                            dtype=np.float64)

            # interrupt deterministically on BOTH processes: the segments
            # loop constructs a CGCheckpoint on every host each segment
            # (only the file write is process-0-gated), so raising on the
            # 2nd construction interrupts after checkpoint #1 is on disk.
            orig_ctor = ckpt_mod.CGCheckpoint
            ctor_calls = {"n": 0}

            def exploding_ctor(*a, **kw):
                ctor_calls["n"] += 1
                if ctor_calls["n"] >= 2:
                    raise _Interrupt()
                return orig_ctor(*a, **kw)

            ckpt_mod.CGCheckpoint = exploding_ctor
            saves_before = save_calls["n"]
            try:
                svm_ck.fit_multihost(
                    f_bin, epsilon=1e-8,
                    checkpoint_path=ckpt_path, checkpoint_interval=3,
                )
                out["checkpoint_interrupted"] = False
            except _Interrupt:
                out["checkpoint_interrupted"] = True
            finally:
                ckpt_mod.CGCheckpoint = orig_ctor
            out["checkpoint_file_exists"] = os.path.isfile(ckpt_path)
            out["checkpoint_saves_interrupted_run"] = (
                save_calls["n"] - saves_before
            )

            # resume: every host loads the shared checkpoint, re-places
            # ITS row window of the saved global state, and converges to
            # the plain fit's answer
            m_res = svm_ck.fit_multihost(
                f_bin, epsilon=1e-8,
                checkpoint_path=ckpt_path, checkpoint_interval=100000,
            )
            arrays["resume_alpha"] = np.asarray(m_res.alpha)
            out["resume_rho"] = float(m_res.rho)
            out["resume_iter"] = int(m_res.n_iter)
            out["checkpoint_file_cleaned"] = not os.path.isfile(ckpt_path)

        if "arff" in scen:
            # ARFF streams through its own windowed native parser
            # (io/arff.parse_arff_file_window) — identical data to the
            # LIBSVM file, so results must match the binary fit bitwise
            current_scenario["name"] = "arff"
            svm_a = p.CSVM(kernel_type="rbf", gamma=0.1, cost=2.0,
                           dtype=np.float64)
            m_a = svm_a.fit_multihost(f_arff, epsilon=1e-8)
            out["arff_rho"] = float(m_a.rho)
            arrays["arff_alpha"] = np.asarray(m_a.alpha)

        if "oneclass_checkpoint" in scen:
            # the one-class multihost checkpoint seam (one_class.py
            # _segments with is_writer gating): same deterministic
            # interrupt as the classifier scenario
            current_scenario["name"] = "oneclass_checkpoint"
            ckpt_path_oc = os.path.join(wd, "mp_oc.ckpt")
            svm_occ = p.CSVM(kernel_type="rbf", gamma=0.1, cost=2.0,
                             dtype=np.float64)
            orig_ctor_oc = ckpt_mod.CGCheckpoint
            ctor_oc = {"n": 0}

            def exploding_ctor_oc(*a, **kw):
                ctor_oc["n"] += 1
                if ctor_oc["n"] >= 2:
                    raise _Interrupt()
                return orig_ctor_oc(*a, **kw)

            ckpt_mod.CGCheckpoint = exploding_ctor_oc
            saves_before_oc = save_calls["n"]
            try:
                fit_one_class_multihost(
                    svm_occ, f_bin, nu=0.2, epsilon=1e-10,
                    checkpoint_path=ckpt_path_oc, checkpoint_interval=3,
                )
                out["oc_ckpt_interrupted"] = False
            except _Interrupt:
                out["oc_ckpt_interrupted"] = True
            finally:
                ckpt_mod.CGCheckpoint = orig_ctor_oc
            out["oc_ckpt_file_exists"] = os.path.isfile(ckpt_path_oc)
            out["oc_ckpt_saves_interrupted"] = (
                save_calls["n"] - saves_before_oc
            )
            m_ocr = fit_one_class_multihost(
                svm_occ, f_bin, nu=0.2, epsilon=1e-10,
                checkpoint_path=ckpt_path_oc, checkpoint_interval=100000,
            )
            arrays["oc_resume_alpha"] = np.asarray(m_ocr.alpha)
            out["oc_resume_rho"] = float(m_ocr.rho)
            out["oc_ckpt_file_cleaned"] = not os.path.isfile(ckpt_path_oc)
            # plain (uncheckpointed) fit for comparison
            m_ocp = fit_one_class_multihost(
                svm_occ, f_bin, nu=0.2, epsilon=1e-10
            )
            arrays["oc_plain_alpha"] = np.asarray(m_ocp.alpha)
            out["oc_plain_rho"] = float(m_ocp.rho)

        if "cli" in scen:
            # plssvm-train --multihost end-to-end inside the process
            # group: exactly ONE process may write the model file
            # (cli/train.py process-0 gating — concurrent buffered writes
            # to one shared-storage path would interleave)
            current_scenario["name"] = "cli"
            from jax.experimental import multihost_utils

            from plssvm_tpu import model as model_mod
            from plssvm_tpu.cli import train as cli_train

            model_saves = {"n": 0}
            orig_model_save = model_mod.Model.save

            def counting_model_save(self_, path_, *a, **k):
                model_saves["n"] += 1
                return orig_model_save(self_, path_, *a, **k)

            model_mod.Model.save = counting_model_save
            model_path = os.path.join(wd, "cli_mh.model")
            try:
                rc = cli_train.main([
                    "-q", "--use_double_as_real_type", "--multihost",
                    "-t", "2", "-g", "0.1", "-c", "2.0", "-e", "1e-8",
                    f_bin, model_path,
                ])
            finally:
                model_mod.Model.save = orig_model_save
            # barrier: don't probe the file before process 0 wrote it
            multihost_utils.process_allgather(np.asarray([rc]))
            out["cli_rc"] = int(rc)
            out["cli_model_saves"] = model_saves["n"]
            out["cli_model_exists"] = os.path.isfile(model_path)
            m_cli = model_mod.Model.load(model_path)
            out["cli_model_rho"] = float(m_cli.rho)

            # plssvm-predict --multihost on the written model: windowed
            # per-host scoring, process-0 writes the predictions file
            from plssvm_tpu.cli import predict as cli_predict

            pred_path = os.path.join(wd, "cli_mh.predict")
            rc_p = cli_predict.main([
                "-q", "--use_double_as_real_type", "--multihost",
                f_test, model_path, pred_path,
            ])
            multihost_utils.process_allgather(np.asarray([rc_p]))
            out["cli_predict_rc"] = int(rc_p)
            out["cli_predict_exists"] = os.path.isfile(pred_path)
            with open(pred_path) as fh:
                out["cli_predict_lines"] = sum(1 for _ in fh)

        out["save_calls_total"] = save_calls["n"]
        out["ingest"] = ingest_rows
        out["ok"] = True
    except Exception:
        out["ok"] = False
        out["error"] = traceback.format_exc()
    finally:
        native_loader.parse_libsvm_native_rows = orig_rows
        ckpt_mod.save_checkpoint = orig_save

    np.savez(os.path.join(wd, f"out_p{pid}.npz"), **arrays)
    with open(os.path.join(wd, f"out_p{pid}.json"), "w") as fh:
        json.dump(out, fh, indent=1)
    if not out["ok"]:
        print(out["error"], file=sys.stderr)
        return 1
    return 0


if __name__ == "__main__":
    sys.exit(main())
