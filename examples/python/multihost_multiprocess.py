"""Multi-host training across REAL processes — the pod launch pattern.

On a TPU pod each host runs this same script; ``initialize_distributed()``
reads the job environment and joins the process group.  This example
demonstrates the identical pattern on one machine by launching itself as
two subprocesses over virtual CPU devices (Gloo collectives) — exactly
what ``tests/test_multiprocess.py`` verifies exhaustively.

The rules that matter on a real pod:

1. ``initialize_distributed()`` (or ``jax.distributed.initialize``) must
   run BEFORE anything touches the XLA backend — constructing a CSVM or
   calling ``jax.devices()`` counts.  On pods with standard job env it
   needs no arguments.
2. The training file must be on storage every host can read; each host
   parses ONLY its row window (windowed native parse).
3. Checkpoint paths must be on SHARED storage; only process 0 writes.
4. Every host returns the identical model; write outputs from one
   process (``jax.process_index() == 0``), as ``plssvm-train
   --multihost`` does.

Run: python examples/python/multihost_multiprocess.py
"""

import os
import subprocess
import sys
import tempfile


def worker(process_id: int, num_processes: int, port: str, wd: str) -> None:
    import numpy as np

    # rule 1: the process group comes up FIRST
    from plssvm_tpu.parallel.multihost import initialize_distributed

    initialize_distributed(
        coordinator_address=f"localhost:{port}",
        num_processes=num_processes,
        process_id=process_id,
    )

    import jax

    import plssvm_tpu as p

    p.set_verbosity("quiet")
    print(
        f"process {jax.process_index()}/{jax.process_count()}: "
        f"{len(jax.local_devices())} local of {len(jax.devices())} "
        "global devices",
        flush=True,
    )

    svm = p.CSVM(kernel_type="rbf", gamma=0.1, cost=2.0, dtype=np.float64)
    model = svm.fit_multihost(
        os.path.join(wd, "train.libsvm"), epsilon=1e-8
    )
    # rule 4: identical model everywhere; one process reports/writes
    if jax.process_index() == 0:
        print(
            f"fit done: rho={model.rho:.6f}, {model.n_iter} CG iterations",
            flush=True,
        )
        model.save(os.path.join(wd, "model.libsvm.model"))

    predicted, _, n = p.parallel.multihost.predict_multihost(
        svm, model, os.path.join(wd, "train.libsvm")
    )
    if jax.process_index() == 0:
        labels = np.asarray(
            p.DataSet(os.path.join(wd, "train.libsvm")).labels
        )
        acc = float(np.mean(np.asarray(predicted) == labels))
        print(f"multihost predict: {n} points, train accuracy {acc:.3f}",
              flush=True)


def launch() -> int:
    import socket

    import numpy as np

    from plssvm_tpu.io.libsvm import write_libsvm_file

    wd = tempfile.mkdtemp(prefix="plssvm_mh_")
    rng = np.random.default_rng(0)
    X = rng.normal(size=(600, 16))
    y = np.where(X[:, 0] > 0, 1, -1)
    write_libsvm_file(os.path.join(wd, "train.libsvm"), X, y)

    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()

    env = dict(
        os.environ,
        JAX_PLATFORMS="cpu",
        XLA_FLAGS="--xla_force_host_platform_device_count=4",
    )
    # drop an axon/tunneled-TPU plugin site dir if present (JAX_PLATFORMS
    # alone is not always enough to keep the plugin from loading)
    env["PYTHONPATH"] = os.pathsep.join(
        p for p in (
            os.path.dirname(os.path.dirname(os.path.dirname(
                os.path.abspath(__file__)
            ))),
        )
    )
    procs = [
        subprocess.Popen(
            [sys.executable, os.path.abspath(__file__),
             "--worker", str(pid), "2", str(port), wd],
            env=env,
        )
        for pid in range(2)
    ]
    rc = max(p.wait() for p in procs)
    print("model file written:",
          os.path.isfile(os.path.join(wd, "model.libsvm.model")))
    return rc


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "--worker":
        worker(int(sys.argv[2]), int(sys.argv[3]), sys.argv[4], sys.argv[5])
    else:
        sys.exit(launch())
