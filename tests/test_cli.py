"""CLI smoke tests (train/predict/scale).

reference analog: tests/CMakeLists.txt:181-210 executable-level tests
(--help, --version, minimal train/predict/scale runs, expected failures).
"""

import os

import numpy as np
import pytest

from plssvm_tpu.cli import predict as cli_predict
from plssvm_tpu.cli import scale as cli_scale
from plssvm_tpu.cli import train as cli_train


@pytest.fixture
def train_file(data_dir):
    return os.path.join(data_dir, "libsvm", "6x3.libsvm")


class TestTrainCLI:
    def test_help(self, capsys):
        with pytest.raises(SystemExit) as e:
            cli_train.main(["--help"])
        assert e.value.code == 0
        assert "kernel_type" in capsys.readouterr().out

    def test_version(self):
        with pytest.raises(SystemExit) as e:
            cli_train.main(["--version"])
        assert e.value.code == 0

    def test_minimal_train(self, train_file, tmp_path, capsys):
        model_file = str(tmp_path / "out.model")
        rc = cli_train.main(["-q", "--use_double_as_real_type", train_file, model_file])
        assert rc == 0
        assert os.path.isfile(model_file)
        content = open(model_file).read()
        assert "svm_type c_svc" in content
        assert "kernel_type linear" in content

    def test_train_rbf_with_params(self, train_file, tmp_path):
        model_file = str(tmp_path / "out.model")
        rc = cli_train.main([
            "-q", "--use_double_as_real_type", "-t", "2", "-g", "0.5",
            "-c", "2.0", "-e", "1e-6", train_file, model_file,
        ])
        assert rc == 0
        content = open(model_file).read()
        assert "kernel_type rbf" in content
        assert "gamma 0.5" in content

    def test_missing_input_fails(self):
        rc = cli_train.main(["-q", "/nonexistent/input.libsvm", "/tmp/x.model"])
        assert rc != 0

    def test_bad_gamma_fails(self, train_file):
        rc = cli_train.main(["-q", "-g", "-1.0", train_file])
        assert rc != 0

    def test_default_model_filename(self, train_file, tmp_path, monkeypatch):
        monkeypatch.chdir(tmp_path)
        rc = cli_train.main(["-q", "--use_double_as_real_type", train_file])
        assert rc == 0
        assert os.path.isfile("6x3.libsvm.model")


class TestPredictCLI:
    def test_train_then_predict(self, train_file, tmp_path, capsys):
        model_file = str(tmp_path / "m.model")
        out_file = str(tmp_path / "p.predict")
        assert cli_train.main(["-q", "--use_double_as_real_type", train_file, model_file]) == 0
        rc = cli_predict.main([
            "--use_double_as_real_type", "--verbosity", "libsvm",
            train_file, model_file, out_file,
        ])
        assert rc == 0
        captured = capsys.readouterr().out
        # libsvm-style accuracy line (main_predict.cpp:79-83)
        assert "Accuracy =" in captured
        assert "(classification)" in captured
        labels = open(out_file).read().split()
        assert len(labels) == 6

    def test_predict_missing_model(self, train_file, tmp_path):
        rc = cli_predict.main(["-q", train_file, "/nonexistent/m.model"])
        assert rc != 0

    @pytest.mark.parametrize("kern", ["linear", "polynomial", "rbf"])
    def test_predict_output_byte_identical_to_reference(
        self, reference_data_dir, tmp_path, kern
    ):
        """The predictions file must be BYTE-identical to the reference's
        own fixture (tests/data/predict/500x200.libsvm.predict): one label
        per line, every line '\\n'-terminated including the last
        (src/main_predict.cpp:53-84)."""
        out_file = str(tmp_path / "out.predict")
        rc = cli_predict.main([
            "-q", "--use_double_as_real_type",
            os.path.join(reference_data_dir, "predict", "500x200_test.libsvm"),
            os.path.join(
                reference_data_dir, "predict", f"500x200_{kern}.libsvm.model"
            ),
            out_file,
        ])
        assert rc == 0
        with open(os.path.join(
            reference_data_dir, "predict", "500x200.libsvm.predict"
        ), "rb") as fh:
            expected = fh.read()
        with open(out_file, "rb") as fh:
            got = fh.read()
        assert got == expected


class TestScaleCLI:
    def test_scale_to_file(self, train_file, tmp_path):
        out = str(tmp_path / "scaled.libsvm")
        factors = str(tmp_path / "factors.txt")
        rc = cli_scale.main(["-q", "-l", "-1", "-u", "1", "-s", factors, train_file, out])
        assert rc == 0
        from plssvm_tpu import DataSet
        ds = DataSet(out)
        assert ds.data.min() >= -1.0 - 1e-9
        assert ds.data.max() <= 1.0 + 1e-9
        assert os.path.isfile(factors)

    def test_scale_to_stdout(self, train_file, capsys):
        rc = cli_scale.main(["-q", train_file])
        assert rc == 0
        out = capsys.readouterr().out
        assert "1:" in out

    def test_scale_restore(self, train_file, tmp_path):
        factors = str(tmp_path / "factors.txt")
        out1 = str(tmp_path / "a.libsvm")
        out2 = str(tmp_path / "b.libsvm")
        assert cli_scale.main(["-q", "-s", factors, train_file, out1]) == 0
        assert cli_scale.main(["-q", "-r", factors, train_file, out2]) == 0
        assert open(out1).read() == open(out2).read()

    def test_save_and_restore_mutually_exclusive(self, train_file, tmp_path):
        rc = cli_scale.main([
            "-q", "-s", str(tmp_path / "s.txt"), "-r", str(tmp_path / "r.txt"),
            train_file,
        ])
        assert rc != 0

    def test_invalid_interval(self, train_file):
        rc = cli_scale.main(["-q", "-l", "1", "-u", "-1", train_file])
        assert rc != 0


class TestProbabilityCLI:
    """plssvm-train --probability / plssvm-predict --probability
    (svm-train/-predict -b 1 equivalents; -b is taken by --backend)."""

    def _write_blobs(self, tmp_path):
        from plssvm_tpu.io.libsvm import write_libsvm_file

        rng = np.random.default_rng(30)
        X = np.concatenate(
            [rng.normal(-1, 1, (40, 5)), rng.normal(1, 1, (40, 5))]
        )
        y = np.array([-1] * 40 + [1] * 40)
        path = str(tmp_path / "blobs.libsvm")
        write_libsvm_file(path, X, y)
        return path

    def test_train_then_predict_probability(self, tmp_path, capsys):
        data_file = self._write_blobs(tmp_path)
        model_file = str(tmp_path / "m.model")
        out_file = str(tmp_path / "p.predict")
        rc = cli_train.main([
            "-q", "-t", "rbf", "-g", "0.2", "--probability",
            data_file, model_file,
        ])
        assert rc == 0
        content = open(model_file).read()
        assert "probA " in content and "probB " in content

        rc = cli_predict.main([
            "-q", "--probability", data_file, model_file, out_file,
        ])
        assert rc == 0
        lines = open(out_file).read().splitlines()
        assert lines[0].startswith("labels ")
        classes = lines[0].split()[1:]
        assert len(lines) == 81
        row = lines[1].split()
        assert row[0] in classes
        probs = [float(x) for x in row[1:]]
        assert len(probs) == len(classes)
        assert sum(probs) == pytest.approx(1.0)

    def test_predict_probability_needs_calibrated_model(
        self, tmp_path, capsys
    ):
        data_file = self._write_blobs(tmp_path)
        model_file = str(tmp_path / "m.model")
        assert cli_train.main(["-q", data_file, model_file]) == 0
        rc = cli_predict.main(["-q", "--probability", data_file, model_file])
        assert rc != 0
        assert "does not support probability" in capsys.readouterr().err

    def test_probability_with_multihost_rejected(self, tmp_path, capsys):
        data_file = self._write_blobs(tmp_path)
        rc = cli_train.main(
            ["-q", "--probability", "--multihost", data_file]
        )
        assert rc != 0
        assert "--multihost" in capsys.readouterr().err


class TestCLIReviewRegressions:
    """Round-8 CLI/parameter review findings, pinned."""

    def test_weight_non_numeric_and_nonpositive_rejected(
        self, train_file, tmp_path, capsys
    ):
        for spec in ("1=abc", "1=0", "1=-2"):
            rc = cli_train.main(
                ["-q", "--weight", spec, train_file,
                 str(tmp_path / "m.model")]
            )
            assert rc == 1, spec
            assert "--weight" in capsys.readouterr().err

    def test_cost_nonpositive_rejected(self, train_file, tmp_path, capsys):
        for c in ("0", "-1"):
            rc = cli_train.main(
                ["-q", "-c", c, train_file, str(tmp_path / "m.model")]
            )
            assert rc == 1, c
            assert "cost" in capsys.readouterr().err

    def test_scale_single_class_file(self, tmp_path, capsys):
        """svm-scale handles one-class training files (all '+1'); the
        label mapper's >=2-classes rule must not apply to scaling."""
        f = str(tmp_path / "oneclass.libsvm")
        with open(f, "w") as fh:
            for i in range(6):
                fh.write(f"+1 1:{i}.0 2:{i + 1}.0\n")
        out = str(tmp_path / "scaled.libsvm")
        rc = cli_scale.main(["-q", "-l", "-1", "-u", "1", f, out])
        assert rc == 0
        content = open(out).read()
        assert content.count("\n") == 6

    def test_predict_svr_single_value_labels(self, tmp_path, capsys):
        """SVR test files often carry a constant placeholder label
        column; prediction must not build a classification mapper over
        it (was: 'At least two different labels' DataSetError)."""
        rng = np.random.default_rng(0)
        X = rng.normal(size=(30, 3))
        yv = X @ np.ones(3)
        from plssvm_tpu.io.libsvm import write_libsvm_file

        ftrain = str(tmp_path / "r.libsvm")
        write_libsvm_file(ftrain, X, yv)
        model_file = str(tmp_path / "r.model")
        assert cli_train.main(
            ["-q", "--use_double_as_real_type", "-s", "epsilon_svr",
             ftrain, model_file]
        ) == 0
        ftest = str(tmp_path / "rtest.libsvm")
        write_libsvm_file(ftest, X[:10], np.zeros(10))  # constant labels
        out = str(tmp_path / "r.predict")
        rc = cli_predict.main(
            ["-q", "--use_double_as_real_type", ftest, model_file, out]
        )
        assert rc == 0
        assert len(open(out).read().split()) == 10
