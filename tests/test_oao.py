"""One-vs-one (OAO) multiclass classification — EXTENSION tests.

The bundled reference rejects > 2 labels (data_set.hpp:443); upstream PLSSVM
v3 added the same OAA/OAO choice.  These tests pin the OAO semantics: the
LIBSVM sv_coef/rho layout (plssvm_tpu.oao), pairwise voting, standard-LIBSVM
model-file interop (a hand-written svm-train-style multiclass file must load
and predict exactly), pairwise-coupled probabilities, and the sklearn facade
(classification='oao', decision_function_shape).
"""

import os
import subprocess
import sys

import numpy as np
import pytest

from test_multiclass import make_multiclass_blobs

from plssvm_tpu import CSVM, ClassificationType, DataSet, Model, SVC
from plssvm_tpu import oao
from plssvm_tpu.exceptions import InvalidFileFormatError, InvalidParameterError


class TestPairLayout:
    def test_class_pairs_libsvm_order(self):
        assert oao.class_pairs(3) == [(0, 1), (0, 2), (1, 2)]
        assert oao.class_pairs(4) == [
            (0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3)
        ]
        assert oao.num_machines(4) == 6
        assert oao.num_machines(2) == 1

    def test_coef_column(self):
        # an SV of class 1 in a 4-class model: machines vs 0, 2, 3 at
        # columns 0, 1, 2 (ascending opposing class, own class skipped)
        assert oao.coef_column(1, 0) == 0
        assert oao.coef_column(1, 2) == 1
        assert oao.coef_column(1, 3) == 2
        assert oao.coef_column(0, 1) == 0
        assert oao.coef_column(3, 0) == 0
        with pytest.raises(ValueError):
            oao.coef_column(2, 2)

    def test_weight_matrix_scatter_round_trip(self):
        C = 3
        classes = np.asarray([0, 1, 2, 0, 1, 2])
        sv_coef = np.zeros((6, C - 1))
        for i, j in oao.class_pairs(C):
            rows = np.flatnonzero((classes == i) | (classes == j))
            alpha = np.arange(1, len(rows) + 1, dtype=float) * (10 * i + j + 1)
            oao.scatter_pair_alphas(sv_coef, rows, classes[rows] == i, alpha, i, j)
        W = oao.weight_matrix(sv_coef, classes, C)
        assert W.shape == (6, 3)
        for m, (i, j) in enumerate(oao.class_pairs(C)):
            # machine m's column is zero exactly outside classes i and j
            outside = ~((classes == i) | (classes == j))
            np.testing.assert_array_equal(W[outside, m], 0.0)
            assert np.all(W[~outside, m] != 0.0)

    def test_vote_semantics_and_tie_break(self):
        # 3 classes, one point: machine (0,1) -> 0, (0,2) -> 2, (1,2) -> 1
        # gives one vote each; the tie resolves to the LOWEST class index
        values = np.asarray([[+1.0, -1.0, +1.0]])
        assert oao.vote(values, 3)[0] == 0
        # zero decision votes the SECOND class of the pair (LIBSVM's > 0)
        values = np.asarray([[0.0, +1.0, +1.0]])
        # (0,1)->1, (0,2)->0, (1,2)->1: class 1 wins with 2 votes
        assert oao.vote(values, 3)[0] == 1

    def test_ovr_from_ovo_keeps_vote_order(self):
        rng = np.random.default_rng(3)
        values = rng.normal(size=(40, oao.num_machines(4)))
        transformed = oao.ovr_from_ovo(values, 4)
        assert transformed.shape == (40, 4)
        # the confidence term only breaks ties: where one class has strictly
        # the most votes, the transform's argmax must agree with the vote
        # (tied rows legitimately differ — sklearn breaks ties by summed
        # confidence, LIBSVM's vote by lowest class index)
        counts = np.zeros((40, 4), dtype=np.int32)
        for m, (i, j) in enumerate(oao.class_pairs(4)):
            positive = values[:, m] > 0
            counts[:, i] += positive
            counts[:, j] += ~positive
        sorted_counts = np.sort(counts, axis=1)
        unique_winner = sorted_counts[:, -1] > sorted_counts[:, -2]
        assert unique_winner.any()
        np.testing.assert_array_equal(
            np.argmax(transformed[unique_winner], axis=1),
            oao.vote(values, 4)[unique_winner],
        )


class TestOAOFit:
    def _fit(self, C=4, n=80, d=5, kernel="rbf", **fit_kwargs):
        X, y = make_multiclass_blobs(n, d, n_classes=C, seed=1)
        ds = DataSet(X, y)
        svm = CSVM(backend="xla", dtype=np.float64, kernel_type=kernel,
                   gamma=0.3 if kernel != "linear" else None)
        model = svm.fit(ds, classification="oao", epsilon=1e-10, **fit_kwargs)
        return svm, model, X, y

    def test_shapes_and_classification_tag(self):
        svm, model, X, y = self._fit()
        assert model.classification == ClassificationType.OAO
        assert np.asarray(model.alpha).shape == (80, 3)
        assert np.asarray(model.rho).shape == (6,)
        assert model.n_iter is not None and model.n_iter > 0

    def test_separable_accuracy(self):
        svm, model, X, y = self._fit()
        assert svm.score(model) == 1.0

    def test_decision_values_match_per_pair_golden(self):
        svm, model, X, y = self._fit(C=3, n=45, d=4)
        ds = model.data
        idx = ds.mapper.map_labels(np.asarray(ds.labels), dtype=np.int64)
        pts = X[:9]
        vals = svm.predict_values(model, DataSet(pts))
        assert vals.shape == (9, 3)
        K = np.exp(
            -0.3 * ((pts[:, None, :] - np.asarray(ds.data)[None]) ** 2).sum(-1)
        )
        svc = np.asarray(model.alpha)
        rho = np.asarray(model.rho)
        for m, (i, j) in enumerate(oao.class_pairs(3)):
            coef = np.zeros(len(idx))
            ii, jj = idx == i, idx == j
            coef[ii] = svc[ii, oao.coef_column(i, j)]
            coef[jj] = svc[jj, oao.coef_column(j, i)]
            np.testing.assert_allclose(
                vals[:, m], K @ coef - rho[m], rtol=1e-8, atol=1e-10
            )

    @pytest.mark.parametrize("strategy", ["sequential", "batched"])
    def test_pair_machine_equals_standalone_binary_fit(self, strategy):
        # machine (i, j) must be the binary LS-SVM on classes i, j — exact
        # for the sequential loop (the same solve call); the batched block
        # CG reorders the Gram contractions, so fp tolerance there
        X, y = make_multiclass_blobs(45, 4, n_classes=3, seed=1)
        ds = DataSet(X, y)
        svm = CSVM(
            backend="xla", dtype=np.float64, kernel_type="rbf", gamma=0.3,
            oao_batch=strategy,
        )
        model = svm.fit(ds, classification="oao", epsilon=1e-10)
        idx = model.data.mapper.map_labels(
            np.asarray(model.data.labels), dtype=np.int64
        )
        i, j = 0, 2
        m = oao.class_pairs(3).index((i, j))
        rows = np.flatnonzero((idx == i) | (idx == j))
        sub = DataSet(
            np.asarray(model.data.data)[rows],
            np.where(idx[rows] == i, 1.0, -1.0),
        )
        binary = svm.fit(sub, epsilon=1e-10)
        rtol = 1e-9 if strategy == "sequential" else 1e-6
        np.testing.assert_allclose(
            float(binary.rho), np.asarray(model.rho)[m], rtol=rtol
        )
        svc = np.asarray(model.alpha)
        got = np.where(
            idx[rows] == i,
            svc[rows, oao.coef_column(i, j)],
            svc[rows, oao.coef_column(j, i)],
        )
        np.testing.assert_allclose(
            got, np.asarray(binary.alpha), rtol=rtol, atol=1e-10
        )

    def test_float32_oao(self):
        """OAO rides the f32 path (the TPU default dtype) too."""
        X, y = make_multiclass_blobs(45, 4, n_classes=3, seed=13)
        ds = DataSet(X.astype(np.float32), y)
        svm = CSVM(
            backend="xla", dtype=np.float32, target="cpu",
            kernel_type="rbf", gamma=0.3,
        )
        model = svm.fit(ds, classification="oao", epsilon=1e-5)
        assert np.asarray(model.alpha).dtype == np.float32
        assert svm.score(model) == 1.0

    def test_distance_kernel_oao(self):
        """OAO pair machines ride the distance-kernel (VPU) paths too."""
        X, y = make_multiclass_blobs(45, 4, n_classes=3, seed=12)
        X = np.abs(X)
        for kern in ("laplacian", "chi_squared"):
            ds = DataSet(X, y)
            svm = CSVM(
                backend="xla", dtype=np.float64, kernel_type=kern, gamma=0.2
            )
            model = svm.fit(ds, classification="oao", epsilon=1e-8)
            assert model.classification == ClassificationType.OAO
            assert svm.score(model) == 1.0

    def test_linear_kernel_oao(self):
        svm, model, X, y = self._fit(kernel="linear")
        assert svm.score(model) == 1.0

    def test_binary_data_ignores_classification(self):
        X, y = make_multiclass_blobs(40, 4, n_classes=2, seed=2)
        ds = DataSet(X, y)
        svm = CSVM(backend="xla", dtype=np.float64, kernel_type="rbf")
        m_oao = svm.fit(ds, classification="oao", epsilon=1e-10)
        m_def = svm.fit(ds, epsilon=1e-10)
        assert np.asarray(m_oao.alpha).ndim == 1
        np.testing.assert_allclose(
            np.asarray(m_oao.alpha), np.asarray(m_def.alpha), rtol=1e-12
        )

    def test_multihost_rejects_oao(self):
        svm = CSVM(backend="xla", dtype=np.float64)
        with pytest.raises(InvalidParameterError, match="oao"):
            svm.fit_multihost("unused.libsvm", classification="oao")


class TestOAOModelFile:
    def test_round_trip(self, tmp_path):
        X, y = make_multiclass_blobs(60, 5, n_classes=4, seed=4)
        ds = DataSet(X, y)
        svm = CSVM(backend="xla", dtype=np.float64, kernel_type="rbf")
        model = svm.fit(ds, classification="oao", epsilon=1e-10)
        path = str(tmp_path / "oao.model")
        model.save(path)
        content = open(path).read()
        assert "nr_class 4" in content
        rho_line = [l for l in content.splitlines() if l.startswith("rho ")][0]
        assert len(rho_line.split()) == 1 + oao.num_machines(4)

        loaded = Model.load(path, label_type=int)
        assert loaded.classification == ClassificationType.OAO
        assert np.asarray(loaded.alpha).shape == (60, 3)
        pts = DataSet(X[:17])
        np.testing.assert_array_equal(
            svm.predict(loaded, pts), svm.predict(model, pts)
        )
        np.testing.assert_allclose(
            svm.predict_values(loaded, pts), svm.predict_values(model, pts),
            rtol=1e-9,
        )

    def test_string_labels_round_trip(self, tmp_path):
        X, y = make_multiclass_blobs(
            30, 3, n_classes=3, seed=5, labels=["ant", "bee", "cat"]
        )
        ds = DataSet(X, y)
        svm = CSVM(backend="xla", dtype=np.float64, kernel_type="linear")
        model = svm.fit(ds, classification="oao", epsilon=1e-10)
        path = str(tmp_path / "oao_str.model")
        model.save(path)
        loaded = Model.load(path, label_type=str)
        np.testing.assert_array_equal(
            svm.predict(loaded, DataSet(X[:11])),
            svm.predict(model, DataSet(X[:11])),
        )

    def test_handwritten_libsvm_multiclass_model(self, tmp_path):
        """A hand-written svm-train-style 3-class model must load as OAO and
        reproduce the textbook decision function exactly (LIBSVM interop)."""
        path = str(tmp_path / "libsvm3.model")
        # 3 classes x 1 SV each, linear kernel.  sv_coef columns per LIBSVM:
        # SV of class 0: [coef in (0,1), coef in (0,2)]
        # SV of class 1: [coef in (0,1), coef in (1,2)]
        # SV of class 2: [coef in (0,2), coef in (1,2)]
        with open(path, "w") as fh:
            fh.write(
                "svm_type c_svc\n"
                "kernel_type linear\n"
                "nr_class 3\n"
                "total_sv 3\n"
                "rho 0.1 -0.2 0.3\n"
                "label 7 8 9\n"
                "nr_sv 1 1 1\n"
                "SV\n"
                "0.5 0.25 1:1.0 2:0.0\n"
                "-0.5 0.75 1:0.0 2:1.0\n"
                "-0.25 -0.75 1:1.0 2:1.0\n"
            )
        model = Model.load(path, label_type=int)
        assert model.classification == ClassificationType.OAO
        assert model.different_labels == [7, 8, 9]

        svm = CSVM(backend="xla", dtype=np.float64, kernel_type="linear")
        pts = np.asarray([[1.0, 0.0], [0.0, 1.0], [2.0, 2.0]])
        vals = svm.predict_values(model, DataSet(pts))
        sv = np.asarray([[1.0, 0.0], [0.0, 1.0], [1.0, 1.0]])
        K = pts @ sv.T
        # machine (0,1): SV0 with 0.5, SV1 with -0.5, rho 0.1
        np.testing.assert_allclose(
            vals[:, 0], 0.5 * K[:, 0] - 0.5 * K[:, 1] - 0.1, rtol=1e-12
        )
        # machine (0,2): SV0 with 0.25, SV2 with -0.25, rho -0.2
        np.testing.assert_allclose(
            vals[:, 1], 0.25 * K[:, 0] - 0.25 * K[:, 2] + 0.2, rtol=1e-12
        )
        # machine (1,2): SV1 with 0.75, SV2 with -0.75, rho 0.3
        np.testing.assert_allclose(
            vals[:, 2], 0.75 * K[:, 1] - 0.75 * K[:, 2] - 0.3, rtol=1e-12
        )
        # votes map through the label list {7, 8, 9}
        preds = svm.predict(model, DataSet(pts))
        assert set(preds.tolist()) <= {7, 8, 9}

    def test_unsorted_label_header_keeps_machine_association(self, tmp_path):
        """LIBSVM writes the label header in APPEARANCE order (e.g.
        'label 9 7 8'); machine enumeration, sv_coef columns and rho all
        follow that order, NOT sorted order — regression test for the
        round-3 review finding (sorted-order indices scrambled them)."""
        path = str(tmp_path / "unsorted.model")
        with open(path, "w") as fh:
            fh.write(
                "svm_type c_svc\n"
                "kernel_type linear\n"
                "nr_class 3\n"
                "total_sv 3\n"
                "rho 0.1 -0.2 0.3\n"
                "label 9 7 8\n"
                "nr_sv 1 1 1\n"
                "SV\n"
                "0.5 0.25 1:1.0 2:0.0\n"   # class 9 (layout index 0)
                "-0.5 0.75 1:0.0 2:1.0\n"  # class 7 (layout index 1)
                "-0.25 -0.75 1:1.0 2:1.0\n"  # class 8 (layout index 2)
            )
        model = Model.load(path, label_type=int)
        assert model.classification == ClassificationType.OAO
        assert model.label_order == [9, 7, 8]

        svm = CSVM(backend="xla", dtype=np.float64, kernel_type="linear")
        pts = np.asarray([[1.0, 0.0], [0.0, 1.0], [2.0, 2.0]])
        vals = svm.predict_values(model, DataSet(pts))
        sv = np.asarray([[1.0, 0.0], [0.0, 1.0], [1.0, 1.0]])
        K = pts @ sv.T
        # machines in LAYOUT order: (9,7), (9,8), (7,8)
        np.testing.assert_allclose(
            vals[:, 0], 0.5 * K[:, 0] - 0.5 * K[:, 1] - 0.1, rtol=1e-12
        )
        np.testing.assert_allclose(
            vals[:, 1], 0.25 * K[:, 0] - 0.25 * K[:, 2] + 0.2, rtol=1e-12
        )
        np.testing.assert_allclose(
            vals[:, 2], 0.75 * K[:, 1] - 0.75 * K[:, 2] - 0.3, rtol=1e-12
        )
        # votes map through the LAYOUT order {9, 7, 8}
        votes = oao.vote(vals, 3)
        expected = np.asarray([9, 7, 8])[votes]
        np.testing.assert_array_equal(svm.predict(model, DataSet(pts)), expected)

        # re-saving keeps the layout: predictions survive the round trip
        path2 = str(tmp_path / "unsorted2.model")
        model.save(path2)
        loaded2 = Model.load(path2, label_type=int)
        np.testing.assert_allclose(
            svm.predict_values(loaded2, DataSet(pts)), vals, rtol=1e-12
        )

    def test_unsorted_label_header_oaa(self, tmp_path):
        """One-vs-all extension files honor the header order too: column c
        belongs to the c-th LABEL-HEADER class, and argmax maps through it."""
        path = str(tmp_path / "unsorted_oaa.model")
        with open(path, "w") as fh:
            fh.write(
                "svm_type c_svc\nkernel_type linear\nnr_class 3\n"
                "total_sv 3\nrho 0.0 0.0 0.0\nlabel 5 1 3\nnr_sv 1 1 1\nSV\n"
                "1.0 0 0 1:1.0 2:0.0\n"   # class 5's OvA machine: +s0
                "0 1.0 0 1:0.0 2:1.0\n"   # class 1's: +s1
                "0 0 1.0 1:-1.0 2:-1.0\n"  # class 3's: +s2
            )
        model = Model.load(path, label_type=int)
        assert model.label_order == [5, 1, 3]
        svm = CSVM(backend="xla", dtype=np.float64, kernel_type="linear")
        # strongly aligned with s0 -> column 0 wins -> label 5 (NOT sorted
        # order's label 1)
        pred = svm.predict(model, DataSet(np.asarray([[3.0, 0.0]])))
        assert pred[0] == 5

    def test_oao_rho_count_mismatch_raises(self, tmp_path):
        # 4 classes, C-1 = 3 coefficient columns imply 6 rho values, not 4
        path = str(tmp_path / "bad_oao.model")
        with open(path, "w") as fh:
            fh.write(
                "svm_type c_svc\nkernel_type linear\nnr_class 4\n"
                "total_sv 4\nrho 0.1 0.2 0.3 0.4\nlabel a b c d\n"
                "nr_sv 1 1 1 1\nSV\n"
                "1 1 1 1:1.0\n1 1 1 1:2.0\n1 1 1 1:3.0\n1 1 1 1:4.0\n"
            )
        with pytest.raises(InvalidFileFormatError, match="one-vs-one"):
            Model.load(path)

    def test_impossible_rho_count_rejected_at_header(self, tmp_path):
        # neither C=4 nor C(C-1)/2=6 rho values
        path = str(tmp_path / "bad_rho.model")
        with open(path, "w") as fh:
            fh.write(
                "svm_type c_svc\nkernel_type linear\nnr_class 4\n"
                "total_sv 4\nrho 0.1 0.2\nlabel a b c d\n"
                "nr_sv 1 1 1 1\nSV\n"
                "1 1 1 1:1.0\n1 1 1 1:2.0\n1 1 1 1:3.0\n1 1 1 1:4.0\n"
            )
        with pytest.raises(InvalidFileFormatError, match="rho"):
            Model.load(path)

    def test_inconsistent_leading_columns_raise(self, tmp_path):
        path = str(tmp_path / "bad_cols.model")
        with open(path, "w") as fh:
            fh.write(
                "svm_type c_svc\nkernel_type linear\nnr_class 3\n"
                "total_sv 3\nrho 0.1 0.2 0.3\nlabel a b c\n"
                "nr_sv 1 1 1\nSV\n"
                "1 1 1:1.0\n1 1 1 1:2.0\n1 1 1:3.0\n"
            )
        with pytest.raises(InvalidFileFormatError, match="alpha"):
            Model.load(path)


class TestPairwiseCoupling:
    def test_recovers_consistent_probabilities(self):
        # build r_ij = p_i / (p_i + p_j) from a known p: coupling must
        # recover p (it is the exact minimizer there)
        p_true = np.asarray([[0.5, 0.3, 0.2], [0.1, 0.2, 0.7]])
        C = 3
        r = np.zeros((2, oao.num_machines(C)))
        for m, (i, j) in enumerate(oao.class_pairs(C)):
            r[:, m] = p_true[:, i] / (p_true[:, i] + p_true[:, j])
        p = oao.pairwise_coupling(r, C, max_iter=1000, eps=1e-10)
        np.testing.assert_allclose(p, p_true, atol=1e-6)
        # the LIBSVM-default tolerance (0.005/C) still lands close
        p_default = oao.pairwise_coupling(r, C)
        np.testing.assert_allclose(p_default, p_true, atol=5e-3)

    def test_rows_sum_to_one(self):
        rng = np.random.default_rng(0)
        r = rng.uniform(0.05, 0.95, size=(25, oao.num_machines(5)))
        p = oao.pairwise_coupling(r, 5)
        np.testing.assert_allclose(p.sum(axis=1), 1.0, atol=1e-9)
        assert np.all(p >= 0)


class TestOAOProbability:
    def test_svc_predict_proba(self):
        X, y = make_multiclass_blobs(90, 4, n_classes=3, seed=6)
        clf = SVC(
            kernel="rbf", gamma=0.3, probability=True, random_state=0,
            classification="oao",
        )
        clf.fit(X, y)
        assert clf.probA_.shape == (3,)  # C(C-1)/2 machines
        P = clf.predict_proba(X[:20])
        assert P.shape == (20, 3)
        np.testing.assert_allclose(P.sum(axis=1), 1.0, atol=1e-9)
        # separable blobs: the coupled probabilities agree with the votes
        agree = np.mean(
            clf.classes_[np.argmax(P, axis=1)] == clf.predict(X[:20])
        )
        assert agree >= 0.9

    def test_prob_round_trip_through_model_file(self, tmp_path):
        X, y = make_multiclass_blobs(60, 3, n_classes=3, seed=7)
        ds = DataSet(X, y)
        svm = CSVM(backend="xla", dtype=np.float64, kernel_type="rbf")
        model = svm.fit(ds, classification="oao", epsilon=1e-8)
        from plssvm_tpu.probability import calibrate_model, predict_probabilities

        calibrate_model(svm, model, ds, random_state=0)
        assert model.prob_a.shape == (3,)
        path = str(tmp_path / "oao_prob.model")
        model.save(path)
        loaded = Model.load(path, label_type=int)
        np.testing.assert_allclose(loaded.prob_a, model.prob_a, rtol=1e-12)
        vals = svm.predict_values(loaded, DataSet(X[:10]))
        P1 = predict_probabilities(loaded, vals)
        P2 = predict_probabilities(model, svm.predict_values(model, DataSet(X[:10])))
        np.testing.assert_allclose(P1, P2, rtol=1e-9)


class TestOAOSklearn:
    def test_decision_function_shapes(self):
        X, y = make_multiclass_blobs(60, 4, n_classes=4, seed=8)
        clf = SVC(kernel="rbf", gamma=0.5, tol=1e-8, classification="oao")
        clf.fit(X, y)
        assert clf.decision_function(X[:5]).shape == (5, 4)  # ovr default
        clf.set_params(decision_function_shape="ovo")
        assert clf.decision_function(X[:5]).shape == (5, 6)
        assert clf.dual_coef_.shape == (3, 60)  # sklearn's (C-1, n_SV)
        assert clf.intercept_.shape == (6,)
        assert clf.score(X, y) == 1.0

    def test_n_iter_per_machine(self):
        X, y = make_multiclass_blobs(45, 3, n_classes=3, seed=10)
        clf = SVC(kernel="rbf", gamma=0.4, classification="oao")
        clf.fit(X, y)
        iters = clf.n_iter_
        assert iters.shape == (3,)  # one entry per ovo machine (sklearn)
        assert np.all(iters > 0)

    def test_linear_coef_oao(self):
        X, y = make_multiclass_blobs(45, 4, n_classes=3, seed=11)
        clf = SVC(kernel="linear", classification="oao")
        clf.fit(X, y)
        w = clf.coef_
        assert w.shape == (3, 4)  # one row per pair machine
        clf.set_params(decision_function_shape="ovo")
        np.testing.assert_allclose(
            X[:6] @ w.T + clf.intercept_[None, :],
            clf.decision_function(X[:6]), rtol=1e-8,
        )

    def test_get_params_round_trip(self):
        clf = SVC(classification="oao", decision_function_shape="ovo")
        params = clf.get_params()
        assert params["classification"] == "oao"
        assert params["decision_function_shape"] == "ovo"


class TestOAOCli:
    def test_train_predict_cli(self, tmp_path):
        X, y = make_multiclass_blobs(45, 3, n_classes=3, seed=9)
        train_file = str(tmp_path / "mc.libsvm")
        from plssvm_tpu.io.libsvm import write_libsvm_file

        write_libsvm_file(train_file, X, y)
        model_file = str(tmp_path / "mc.model")
        env = dict(os.environ)
        env["PYTHONPATH"] = (
            os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
            + os.pathsep + env.get("PYTHONPATH", "")
        )
        out = subprocess.run(
            [sys.executable, "-m", "plssvm_tpu.cli.train",
             "--classification", "oao", "-t", "2", "-p", "cpu",
             train_file, model_file],
            capture_output=True, text=True, env=env, timeout=300,
        )
        assert out.returncode == 0, out.stderr
        content = open(model_file).read()
        assert "nr_class 3" in content
        rho_line = [l for l in content.splitlines() if l.startswith("rho ")][0]
        assert len(rho_line.split()) == 4  # 3 pair machines

        pred_file = str(tmp_path / "mc.predict")
        out = subprocess.run(
            [sys.executable, "-m", "plssvm_tpu.cli.predict", "-p", "cpu",
             train_file, model_file, pred_file],
            capture_output=True, text=True, env=env, timeout=300,
        )
        assert out.returncode == 0, out.stderr
        assert "Accuracy = 100" in out.stdout + out.stderr


class TestOAOBatched:
    """The batched pair-machine block CG (solver/cg.py::solve_ls_svm_pairs).

    EXTENSION — a TPU-native OAO training strategy: all C(C-1)/2 machines
    solved in ONE jitted while_loop with per-machine convergence freezing
    and per-machine iteration caps, instead of a sequential per-machine
    dispatch chain.  Results must match the sequential path to fp tolerance
    for every composition (kernels, weights, caps, unbalanced classes).
    """

    def _parity(self, X, y, kernel="rbf", gamma=0.3, sample_weight=None,
                max_iter=None, rtol=1e-6):
        kwargs = dict(backend="xla", dtype=np.float64, kernel_type=kernel)
        if gamma is not None and kernel != "linear":
            kwargs["gamma"] = gamma
        seq = CSVM(oao_batch="sequential", **kwargs)
        bat = CSVM(oao_batch="batched", **kwargs)
        m1 = seq.fit(
            DataSet(X, y), classification="oao", epsilon=1e-10,
            sample_weight=sample_weight, max_iter=max_iter,
        )
        m2 = bat.fit(
            DataSet(X, y), classification="oao", epsilon=1e-10,
            sample_weight=sample_weight, max_iter=max_iter,
        )
        np.testing.assert_allclose(
            np.asarray(m2.rho), np.asarray(m1.rho), rtol=rtol, atol=1e-8
        )
        np.testing.assert_allclose(
            np.asarray(m2.alpha), np.asarray(m1.alpha), rtol=rtol, atol=1e-8
        )
        return m1, m2

    def test_parity_rbf(self):
        X, y = make_multiclass_blobs(100, 6, n_classes=4, seed=21)
        m1, m2 = self._parity(X, y)
        assert m2.n_iter_per_machine == m1.n_iter_per_machine

    def test_parity_linear(self):
        X, y = make_multiclass_blobs(80, 5, n_classes=3, seed=22)
        self._parity(X, y, kernel="linear", gamma=None)

    def test_parity_distance_kernel(self):
        X, y = make_multiclass_blobs(60, 4, n_classes=3, seed=23)
        self._parity(np.abs(X), y, kernel="laplacian", gamma=0.2)

    def test_parity_unbalanced_classes(self):
        # machine sizes 10+40, 10+110, 40+110: the padded block must not
        # perturb small machines, and each stops at its own cap
        rng = np.random.default_rng(24)
        sizes = (10, 40, 110)
        X = np.vstack([
            rng.normal(loc=3.0 * c, size=(s, 5))
            for c, s in enumerate(sizes)
        ])
        y = np.concatenate([np.full(s, c) for c, s in enumerate(sizes)])
        m1, m2 = self._parity(X, y)
        assert m2.n_iter_per_machine == m1.n_iter_per_machine

    def test_parity_weighted(self):
        X, y = make_multiclass_blobs(75, 5, n_classes=3, seed=25)
        sw = np.random.default_rng(25).uniform(0.5, 2.0, size=len(y))
        self._parity(X, y, sample_weight=sw)

    def test_per_machine_iteration_caps(self):
        # each machine's cap is its own point count (the binary default) —
        # with an explicit max_iter both strategies stop at the same place
        X, y = make_multiclass_blobs(90, 6, n_classes=3, seed=26)
        m1, m2 = self._parity(X, y, max_iter=3, rtol=1e-6)
        assert all(v <= 3 for v in m2.n_iter_per_machine)
        assert m2.n_iter_per_machine == m1.n_iter_per_machine

    def test_auto_picks_batched_and_tracks(self):
        from plssvm_tpu.utils.tracker import global_tracker

        X, y = make_multiclass_blobs(60, 4, n_classes=3, seed=27)
        svm = CSVM(backend="xla", dtype=np.float64, kernel_type="rbf")
        assert svm.oao_batch == "auto"
        global_tracker.clear()
        svm.fit(DataSet(X, y), classification="oao", epsilon=1e-8)
        cg = dict(global_tracker.entries().get("cg", []))
        assert cg.get("oao_strategy") == "batched"

    def test_auto_respects_budget_env(self, monkeypatch):
        from plssvm_tpu.utils.tracker import global_tracker

        monkeypatch.setenv("PLSSVM_OAO_BATCH_BUDGET_GB", "0")
        X, y = make_multiclass_blobs(60, 4, n_classes=3, seed=28)
        svm = CSVM(backend="xla", dtype=np.float64, kernel_type="rbf")
        global_tracker.clear()
        svm.fit(DataSet(X, y), classification="oao", epsilon=1e-8)
        cg = dict(global_tracker.entries().get("cg", []))
        assert cg.get("oao_strategy") != "batched"

    def test_forced_batched_rejects_checkpointing(self, tmp_path):
        X, y = make_multiclass_blobs(45, 4, n_classes=3, seed=29)
        svm = CSVM(
            backend="xla", dtype=np.float64, kernel_type="rbf",
            oao_batch="batched",
        )
        with pytest.raises(InvalidParameterError, match="checkpoint"):
            svm.fit(
                DataSet(X, y), classification="oao",
                checkpoint_path=str(tmp_path / "ck"),
            )

    def test_invalid_strategy_rejected(self):
        with pytest.raises(InvalidParameterError, match="oao_batch"):
            CSVM(backend="xla", oao_batch="nope")

    def test_batched_f32_compensated(self):
        # the f32 default turns on compensated scalar reductions — the
        # batched transposed compensated folds must converge to a working
        # model
        X, y = make_multiclass_blobs(60, 4, n_classes=3, seed=30)
        svm = CSVM(
            backend="xla", dtype=np.float32, target="cpu",
            kernel_type="rbf", gamma=0.3, oao_batch="batched",
        )
        assert svm.scalar_precision == "compensated"
        model = svm.fit(DataSet(X.astype(np.float32), y),
                        classification="oao", epsilon=1e-5)
        assert svm.score(model) == 1.0

    def test_batched_warm_start_zero_iters(self):
        X, y = make_multiclass_blobs(60, 4, n_classes=3, seed=31)
        svm = CSVM(
            backend="xla", dtype=np.float64, kernel_type="rbf",
            oao_batch="batched",
        )
        m1 = svm.fit(DataSet(X, y), classification="oao", epsilon=1e-10)
        m2 = svm.fit(
            DataSet(X, y), classification="oao", epsilon=1e-10,
            initial_model=m1,
        )
        assert m2.n_iter == 0

    def test_batched_jacobi_preconditioner(self):
        X, y = make_multiclass_blobs(60, 4, n_classes=3, seed=32)
        plain = CSVM(
            backend="xla", dtype=np.float64, kernel_type="rbf",
            oao_batch="batched",
        )
        pcg = CSVM(
            backend="xla", dtype=np.float64, kernel_type="rbf",
            oao_batch="batched", preconditioner="jacobi",
        )
        m1 = plain.fit(DataSet(X, y), classification="oao", epsilon=1e-10)
        m2 = pcg.fit(DataSet(X, y), classification="oao", epsilon=1e-10)
        np.testing.assert_allclose(
            np.asarray(m2.rho), np.asarray(m1.rho), rtol=1e-6, atol=1e-8
        )


def test_oao_caches_invalidate_on_alpha_replacement():
    """Replacing model.alpha (e.g. an external refit writing into the same
    Model) must rebuild the cached weight expansion and shadow model."""
    import plssvm_tpu as p
    from plssvm_tpu import oao as oao_mod

    rng = np.random.default_rng(12)
    X = np.concatenate([c + 0.5 * rng.normal(size=(20, 3)) for c in
                        (np.zeros(3), 3 * np.ones(3), -3 * np.ones(3))])
    y = np.repeat([0, 1, 2], 20)
    svm = p.CSVM(backend="xla", dtype=np.float64, kernel_type="linear")
    model = svm.fit(p.DataSet(X, y, dtype=np.float64),
                    classification="oao")
    ds = p.DataSet(X, dtype=np.float64)
    v1 = svm.predict_values(model, ds)
    W1 = oao_mod.model_weight_matrix(model)
    assert oao_mod.model_weight_matrix(model) is W1  # cache hit
    model.alpha = np.asarray(model.alpha) * 2.0
    W2 = oao_mod.model_weight_matrix(model)
    assert W2 is not W1
    np.testing.assert_allclose(W2, 2.0 * W1)
    v2 = svm.predict_values(model, ds)
    # rho is unchanged, so doubled sv_coef must NOT reproduce v1
    assert not np.allclose(v1, v2)
    np.testing.assert_allclose(v2 + np.atleast_1d(model.rho), 
                               2.0 * (v1 + np.atleast_1d(model.rho)),
                               rtol=1e-9)


class TestOAOMeshBatched:
    """Machine-axis-sharded batched OAO over multi-device meshes (round 5).

    parallel.sharded.build_sharded_pairs_solver: the C(C-1)/2 machines are
    independent systems, so the mesh shards the MACHINE axis — each device
    runs the batched pair CG on its local machines with ZERO collectives
    (a shard's while_loop stops when ITS machines converge).  Closes the
    round-4 verdict's "OAO on multi-device meshes runs sequentially" gap;
    reference analog: gpu_csvm.hpp:477-654.
    """

    def _data(self, C=8, n=320, d=10, seed=5):
        rng = np.random.default_rng(seed)
        centers = rng.normal(scale=3.0, size=(C, d))
        y = rng.integers(0, C, size=n)
        y[:C] = np.arange(C)
        X = rng.normal(size=(n, d)) + centers[y]
        return X, y

    def _mesh_devices(self, ndev):
        import jax

        devs = jax.devices("cpu")
        if len(devs) < ndev:
            pytest.skip(f"needs {ndev} virtual CPU devices")
        return devs[:ndev]

    @pytest.mark.parametrize("ndev", [4, 8])
    def test_mesh_batched_matches_sequential(self, ndev):
        """8-class OAO (28 machines, not a device multiple -> dummy
        padding) on the mesh must match the sequential mesh path."""
        devs = self._mesh_devices(ndev)
        X, y = self._data()
        kwargs = dict(backend="xla", dtype=np.float64, kernel_type="rbf",
                      gamma=0.2, cost=2.0, devices=devs)
        m_seq = CSVM(oao_batch="sequential", **kwargs).fit(
            DataSet(X, y), classification="oao", epsilon=1e-8
        )
        m_bat = CSVM(oao_batch="batched", **kwargs).fit(
            DataSet(X, y), classification="oao", epsilon=1e-8
        )
        # the sequential mesh path row-shards each machine's CG (different
        # reduction order), so agreement is CG-tolerance class (eps=1e-8),
        # not bitwise
        np.testing.assert_allclose(
            np.asarray(m_bat.rho), np.asarray(m_seq.rho),
            rtol=2e-4, atol=1e-6,
        )
        np.testing.assert_allclose(
            np.asarray(m_bat.alpha), np.asarray(m_seq.alpha),
            rtol=1e-3, atol=1e-5,
        )

    def test_mesh_batched_matches_single_device_batched(self):
        devs = self._mesh_devices(8)
        X, y = self._data()
        kwargs = dict(backend="xla", dtype=np.float64, kernel_type="rbf",
                      gamma=0.2, cost=2.0, oao_batch="batched")
        m_mesh = CSVM(devices=devs, **kwargs).fit(
            DataSet(X, y), classification="oao", epsilon=1e-8
        )
        m_one = CSVM(**kwargs).fit(
            DataSet(X, y), classification="oao", epsilon=1e-8
        )
        np.testing.assert_allclose(
            np.asarray(m_mesh.rho), np.asarray(m_one.rho),
            rtol=1e-8, atol=1e-10,
        )
        np.testing.assert_allclose(
            np.asarray(m_mesh.alpha), np.asarray(m_one.alpha),
            rtol=1e-7, atol=1e-9,
        )

    def test_mesh_batched_weighted_and_warm(self):
        """sample_weight shards per machine; a warm start from the
        converged model takes 0 iterations on the mesh (dummy-machine
        weights pad with ones so QA_cost stays finite)."""
        devs = self._mesh_devices(8)
        X, y = self._data()
        rng = np.random.default_rng(0)
        sw = rng.uniform(0.5, 2.0, size=len(y))
        kwargs = dict(backend="xla", dtype=np.float64, kernel_type="rbf",
                      gamma=0.2, cost=2.0, devices=devs)
        mw_seq = CSVM(oao_batch="sequential", **kwargs).fit(
            DataSet(X, y), classification="oao", epsilon=1e-8,
            sample_weight=sw,
        )
        bat = CSVM(oao_batch="batched", **kwargs)
        mw_bat = bat.fit(
            DataSet(X, y), classification="oao", epsilon=1e-8,
            sample_weight=sw,
        )
        np.testing.assert_allclose(
            np.asarray(mw_bat.rho), np.asarray(mw_seq.rho),
            rtol=2e-4, atol=1e-6,
        )
        m_warm = bat.fit(
            DataSet(X, y), classification="oao", epsilon=1e-8,
            sample_weight=sw, initial_model=mw_bat,
        )
        assert m_warm.n_iter == 0

    def test_auto_batches_on_mesh(self):
        """oao_batch='auto' now batches on meshes when the per-device
        stack fits (the round-4 unconditional sequential gate is gone)."""
        from plssvm_tpu.utils.tracker import global_tracker

        devs = self._mesh_devices(4)
        X, y = self._data(C=5, n=200)
        global_tracker.clear()
        CSVM(backend="xla", dtype=np.float64, kernel_type="rbf",
             gamma=0.2, devices=devs).fit(
            DataSet(X, y), classification="oao", epsilon=1e-6
        )
        cg = dict(global_tracker.entries().get("cg", []))
        assert cg.get("oao_strategy") == "batched"
