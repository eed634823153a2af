"""The extension kernels: sigmoid, laplacian, chi-squared.

These match upstream PLSSVM v3's kernel set (the reference snapshot stops at
linear/polynomial/rbf — kernel_function_types.hpp:31-38).  Sigmoid is a Gram
kernel and runs every path including the fused Pallas kernels; laplacian and
chi-squared are distance kernels computed with tiled VPU reductions on the
XLA path (kernel_functions.pairwise_distance).
"""

import os
import tempfile

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import plssvm_tpu as p
from plssvm_tpu.exceptions import (
    InvalidFileFormatError,
    InvalidParameterError,
    UnsupportedKernelTypeError,
)
from plssvm_tpu.kernel_functions import (
    distance_to_point,
    is_gram_kernel,
    kernel_against_point,
    kernel_block,
    kernel_function,
    kernel_self_diag,
    pairwise_distance,
)
from plssvm_tpu.parameter import KernelFunctionType as KT, Parameter

from conftest import make_blobs

NEW_KERNELS = (KT.SIGMOID, KT.LAPLACIAN, KT.CHI_SQUARED)


def _oracle_kernel(u, v, kind, gamma, coef0, degree):
    u = np.asarray(u, np.float64)
    v = np.asarray(v, np.float64)
    if kind == KT.LINEAR:
        return np.dot(u, v)
    if kind == KT.POLYNOMIAL:
        return (gamma * np.dot(u, v) + coef0) ** degree
    if kind == KT.RBF:
        return np.exp(-gamma * np.sum((u - v) ** 2))
    if kind == KT.SIGMOID:
        return np.tanh(gamma * np.dot(u, v) + coef0)
    if kind == KT.LAPLACIAN:
        return np.exp(-gamma * np.sum(np.abs(u - v)))
    den = u + v
    num = (u - v) ** 2
    terms = np.divide(num, den, out=np.zeros_like(num), where=den != 0)
    return np.exp(-gamma * np.sum(terms))


def _oracle_matrix(A, B, kind, gamma, coef0, degree):
    return np.array(
        [[_oracle_kernel(a, b, kind, gamma, coef0, degree) for b in B] for a in A]
    )


# ---------------------------------------------------------------------------
# parameter machinery
# ---------------------------------------------------------------------------


class TestParameter:
    @pytest.mark.parametrize(
        "name,value",
        [("sigmoid", KT.SIGMOID), ("laplacian", KT.LAPLACIAN),
         ("chi_squared", KT.CHI_SQUARED), ("chi-squared", KT.CHI_SQUARED),
         ("3", KT.SIGMOID), ("4", KT.LAPLACIAN), ("5", KT.CHI_SQUARED),
         (3, KT.SIGMOID), (4, KT.LAPLACIAN), (5, KT.CHI_SQUARED)],
    )
    def test_from_string(self, name, value):
        assert KT.from_string(name) == value

    def test_round_trip_and_math_string(self):
        for kt in NEW_KERNELS:
            assert KT.from_string(str(kt)) == kt
            assert kt.math_string

    def test_invalid_index_still_rejected(self):
        with pytest.raises(UnsupportedKernelTypeError):
            KT.from_string(6)

    def test_equivalent_kernel_aware(self):
        # sigmoid compares gamma/coef0/cost but NOT degree
        a = Parameter(kernel_type="sigmoid", gamma=0.5, coef0=1.0, degree=2)
        b = Parameter(kernel_type="sigmoid", gamma=0.5, coef0=1.0, degree=9)
        assert a.equivalent(b)
        b = Parameter(kernel_type="sigmoid", gamma=0.5, coef0=2.0)
        assert not a.equivalent(b)
        # laplacian/chi_squared compare gamma/cost only
        a = Parameter(kernel_type="laplacian", gamma=0.5, coef0=3.0)
        b = Parameter(kernel_type="laplacian", gamma=0.5, coef0=9.0)
        assert a.equivalent(b)
        b = Parameter(kernel_type="laplacian", gamma=0.25)
        assert not a.equivalent(b)

    @pytest.mark.parametrize("name", ["sigmoid", "laplacian", "chi_squared"])
    def test_sanity_check_rejects_nonpositive_gamma(self, name):
        with pytest.raises(InvalidParameterError, match="gamma"):
            Parameter(kernel_type=name, gamma=-1.0).sanity_check()

    def test_gram_kernel_classification(self):
        assert is_gram_kernel(KT.SIGMOID)
        assert not is_gram_kernel(KT.LAPLACIAN)
        assert not is_gram_kernel(KT.CHI_SQUARED)


# ---------------------------------------------------------------------------
# kernel math vs the scalar oracle
# ---------------------------------------------------------------------------


ALL_KERNELS = (KT.LINEAR, KT.POLYNOMIAL, KT.RBF) + NEW_KERNELS


class TestKernelMath:
    gamma, coef0, degree = 0.3, 0.5, 3

    @pytest.mark.parametrize("kind", ALL_KERNELS, ids=str)
    def test_kernel_block_matches_oracle(self, kind):
        rng = np.random.default_rng(0)
        A = np.abs(rng.normal(size=(13, 7))).astype(np.float32)
        B = np.abs(rng.normal(size=(29, 7))).astype(np.float32)
        K = np.asarray(kernel_block(
            jnp.asarray(A), jnp.asarray(B),
            jnp.asarray(np.sum(A * A, -1)), jnp.asarray(np.sum(B * B, -1)),
            kind, self.gamma, self.coef0, self.degree,
        ))
        Ko = _oracle_matrix(A, B, kind, self.gamma, self.coef0, self.degree)
        np.testing.assert_allclose(K, Ko, rtol=1e-4, atol=1e-5)

    @pytest.mark.parametrize("kind", ALL_KERNELS, ids=str)
    def test_host_kernel_function(self, kind):
        rng = np.random.default_rng(1)
        u = np.abs(rng.normal(size=11))
        v = np.abs(rng.normal(size=11))
        params = Parameter(
            kernel_type=kind, gamma=self.gamma, coef0=self.coef0,
            degree=self.degree,
        )
        got = kernel_function(u, v, params)
        want = _oracle_kernel(u, v, kind, self.gamma, self.coef0, self.degree)
        assert got == pytest.approx(want, rel=1e-10)

    @pytest.mark.parametrize("kind", ALL_KERNELS, ids=str)
    def test_kernel_self_diag(self, kind):
        rng = np.random.default_rng(2)
        X = np.abs(rng.normal(size=(9, 5)))
        sq = jnp.asarray(np.sum(X * X, -1))
        diag = np.asarray(
            kernel_self_diag(sq, kind, self.gamma, self.coef0, self.degree)
        )
        want = [
            _oracle_kernel(x, x, kind, self.gamma, self.coef0, self.degree)
            for x in X
        ]
        np.testing.assert_allclose(diag, want, rtol=1e-6)

    @pytest.mark.parametrize("kind", NEW_KERNELS, ids=str)
    def test_q_kernel_against_point(self, kind):
        rng = np.random.default_rng(3)
        X = np.abs(rng.normal(size=(37, 6))).astype(np.float32)
        pt = np.abs(rng.normal(size=6)).astype(np.float32)
        q = np.asarray(kernel_against_point(
            jnp.asarray(X), jnp.asarray(pt), kind,
            self.gamma, self.coef0, self.degree,
        ))
        want = [
            _oracle_kernel(x, pt, kind, self.gamma, self.coef0, self.degree)
            for x in X
        ]
        np.testing.assert_allclose(q, want, rtol=1e-4)


class TestPairwiseDistance:
    """The tiled distance computation, covering every blocking regime."""

    def _dist_oracle(self, A, B, kind):
        if kind == KT.LAPLACIAN:
            return np.sum(np.abs(A[:, None, :] - B[None, :, :]), -1)
        den = A[:, None, :] + B[None, :, :]
        num = (A[:, None, :] - B[None, :, :]) ** 2
        return np.sum(np.where(den != 0, num / np.where(den != 0, den, 1), 0), -1)

    @pytest.mark.parametrize("kind", NEW_KERNELS[1:], ids=str)
    @pytest.mark.parametrize(
        "m,d",
        [(512, 512),   # column AND feature scans active
         (64, 7),      # single tile
         (331, 13),    # prime column count -> internal zero-padding
         (64, 331)],   # prime feature count -> internal zero-padding
        ids=["scans", "single", "prime-cols", "prime-feats"],
    )
    def test_blocked_vs_oracle(self, kind, m, d):
        rng = np.random.default_rng(4)
        A = np.abs(rng.normal(size=(16, d))).astype(np.float32)
        B = np.abs(rng.normal(size=(m, d))).astype(np.float32)
        D = np.asarray(pairwise_distance(jnp.asarray(A), jnp.asarray(B), kind))
        np.testing.assert_allclose(
            D, self._dist_oracle(A, B, kind), rtol=1e-4, atol=1e-4
        )

    @pytest.mark.parametrize("m", [37, 8192], ids=["single", "blocked"])
    def test_distance_to_point(self, m):
        rng = np.random.default_rng(5)
        X = np.abs(rng.normal(size=(m, 9))).astype(np.float32)
        pt = np.abs(rng.normal(size=9)).astype(np.float32)
        d = np.asarray(distance_to_point(jnp.asarray(X), jnp.asarray(pt), KT.LAPLACIAN))
        np.testing.assert_allclose(
            d, np.sum(np.abs(X - pt[None, :]), -1), rtol=1e-4, atol=1e-4
        )

    def test_zero_padded_features_are_neutral(self):
        # 0/0 chi-squared terms and |0-0| laplacian terms must contribute 0
        rng = np.random.default_rng(6)
        A = np.abs(rng.normal(size=(8, 5))).astype(np.float32)
        B = np.abs(rng.normal(size=(8, 5))).astype(np.float32)
        Ap = np.concatenate([A, np.zeros((8, 3), np.float32)], axis=1)
        Bp = np.concatenate([B, np.zeros((8, 3), np.float32)], axis=1)
        for kind in (KT.LAPLACIAN, KT.CHI_SQUARED):
            D = pairwise_distance(jnp.asarray(A), jnp.asarray(B), kind)
            Dp = pairwise_distance(jnp.asarray(Ap), jnp.asarray(Bp), kind)
            np.testing.assert_allclose(np.asarray(D), np.asarray(Dp), rtol=1e-6)


# ---------------------------------------------------------------------------
# end-to-end training / prediction / model IO
# ---------------------------------------------------------------------------


def _fit_kwargs(kind):
    if kind == KT.SIGMOID:
        # small gamma and cost keep the (indefinite) tanh kernel matrix
        # near-PSD so CG converges quickly; larger gamma still classifies
        # but needs many iterations (inherent to sigmoid kernels)
        return dict(gamma=0.02, coef0=0.0, cost=1.0)
    return dict(gamma=0.1, cost=10.0)


def _blobs_for(kind, n=240, d=14, seed=7):
    X, y = make_blobs(n, d, seed=seed, dtype=np.float32)
    if kind == KT.CHI_SQUARED:
        X = np.abs(X)
        half = n // 2
        X[y > 0] += 1.5  # re-separate after the abs fold
    return X, y


class TestEndToEnd:
    @pytest.mark.parametrize("kind", NEW_KERNELS, ids=str)
    def test_fit_score_roundtrip(self, kind):
        X, y = _blobs_for(kind)
        ds = p.DataSet(X, y)
        svm = p.CSVM(kernel_type=kind, **_fit_kwargs(kind))
        model = svm.fit(ds, epsilon=1e-5, max_iter=200)
        assert svm.score(model) >= 0.97

        with tempfile.TemporaryDirectory() as td:
            path = os.path.join(td, "m.model")
            model.save(path)
            header = open(path).read()
            assert f"kernel_type {kind}" in header
            loaded = p.Model.load(path)
            # the model file stores values as {:.10e} text — round-trip is
            # accurate to the printed precision, not bit-exact
            np.testing.assert_allclose(
                svm.predict_values(model, ds), svm.predict_values(loaded, ds),
                rtol=1e-5, atol=1e-6,
            )

    def test_sigmoid_header_has_gamma_and_coef0(self):
        X, y = _blobs_for(KT.SIGMOID, n=64, d=6)
        svm = p.CSVM(kernel_type="sigmoid", gamma=0.05, coef0=-0.5)
        model = svm.fit(p.DataSet(X, y), max_iter=20)
        with tempfile.TemporaryDirectory() as td:
            path = os.path.join(td, "m.model")
            model.save(path)
            lines = open(path).read().splitlines()
        assert "gamma 0.05" in lines
        assert "coef0 -0.5" in lines
        assert not any(line.startswith("degree") for line in lines)

    def test_laplacian_header_has_gamma_only(self):
        X, y = _blobs_for(KT.LAPLACIAN, n=64, d=6)
        svm = p.CSVM(kernel_type="laplacian", gamma=0.25)
        model = svm.fit(p.DataSet(X, y), max_iter=20)
        with tempfile.TemporaryDirectory() as td:
            path = os.path.join(td, "m.model")
            model.save(path)
            lines = open(path).read().splitlines()
        assert "gamma 0.25" in lines
        assert not any(line.startswith(("degree", "coef0")) for line in lines)

    @pytest.mark.parametrize(
        "kind,bad_param",
        [("sigmoid", "degree 3"), ("laplacian", "coef0 1.0"),
         ("laplacian", "degree 3"), ("chi_squared", "coef0 1.0"),
         ("chi_squared", "degree 3")],
    )
    def test_model_file_rejects_irrelevant_params(self, kind, bad_param):
        content = (
            "svm_type c_svc\n"
            f"kernel_type {kind}\n"
            "gamma 0.5\n"
            f"{bad_param}\n"
            "nr_class 2\n"
            "total_sv 2\n"
            "rho 0.0\n"
            "label 1 -1\n"
            "nr_sv 1 1\n"
            "SV\n"
            "1.0 1:1.0 2:2.0\n"
            "-1.0 1:3.0 2:4.0\n"
        )
        with tempfile.TemporaryDirectory() as td:
            path = os.path.join(td, "m.model")
            with open(path, "w") as fh:
                fh.write(content)
            name = bad_param.split()[0]
            with pytest.raises(InvalidFileFormatError, match=name):
                p.Model.load(path)

    def test_chi_squared_rejects_negative_data(self):
        X, y = make_blobs(64, 6, seed=8, dtype=np.float32)  # has negatives
        svm = p.CSVM(kernel_type="chi_squared", gamma=0.1)
        with pytest.raises(InvalidParameterError, match="non-negative"):
            svm.fit(p.DataSet(X, y))

        # ...and at predict time for the points
        Xp, yp = _blobs_for(KT.CHI_SQUARED, n=64, d=6)
        model = svm.fit(p.DataSet(Xp, yp), max_iter=20)
        with pytest.raises(InvalidParameterError, match="non-negative"):
            svm.predict(model, p.DataSet(X))

    @pytest.mark.parametrize("kind", NEW_KERNELS, ids=str)
    def test_jacobi_preconditioner(self, kind):
        X, y = _blobs_for(kind, n=160, d=10, seed=9)
        ds = p.DataSet(X, y)
        kw = _fit_kwargs(kind)
        plain = p.CSVM(kernel_type=kind, **kw).fit(ds, epsilon=1e-7)
        pre = p.CSVM(
            kernel_type=kind, preconditioner="jacobi", **kw
        ).fit(p.DataSet(X, y), epsilon=1e-7)
        np.testing.assert_allclose(plain.alpha, pre.alpha, atol=5e-3)
        assert plain.rho == pytest.approx(pre.rho, abs=1e-4)

    def test_multiclass_laplacian(self):
        rng = np.random.default_rng(10)
        n, d, C = 180, 8, 3
        centers = rng.normal(size=(C, d)) * 4.0
        labels = rng.integers(0, C, size=n)
        X = (centers[labels] + 0.3 * rng.normal(size=(n, d))).astype(np.float32)
        ds = p.DataSet(X, labels)
        svm = p.CSVM(kernel_type="laplacian", gamma=0.2, cost=10.0)
        model = svm.fit(ds, epsilon=1e-5, max_iter=150)
        assert svm.score(model) >= 0.97

    def test_blocked_predict_matches_one_shot(self):
        # the streaming predict path (alpha.ndim == 2 forces it) must agree
        # with the one-shot kernel block for distance kernels
        from plssvm_tpu.ops.predict import predict_values, predict_values_blocked

        rng = np.random.default_rng(11)
        sv = np.abs(rng.normal(size=(96, 10))).astype(np.float32)
        pts = np.abs(rng.normal(size=(64, 10))).astype(np.float32)
        alpha = rng.normal(size=96).astype(np.float32)
        for kind in NEW_KERNELS:
            one = predict_values(
                jnp.asarray(sv), jnp.asarray(alpha), jnp.asarray(0.1),
                jnp.zeros((10,), jnp.float32), jnp.asarray(pts),
                jnp.asarray(0.2), jnp.asarray(0.5), kind=kind, degree=3,
            )
            blocked = predict_values_blocked(
                jnp.asarray(sv), jnp.asarray(alpha), jnp.asarray(0.1),
                jnp.asarray(pts), jnp.asarray(0.2), jnp.asarray(0.5),
                kind=kind, degree=3, row_block=16,
            )
            np.testing.assert_allclose(
                np.asarray(one), np.asarray(blocked), rtol=1e-4, atol=1e-5
            )


# ---------------------------------------------------------------------------
# sharded solve over the virtual mesh
# ---------------------------------------------------------------------------


class TestSharded:
    @pytest.mark.parametrize("kind", NEW_KERNELS, ids=str)
    def test_sharded_matches_single_device(self, kind, cpu_devices):
        if len(cpu_devices) < 8:
            pytest.skip("needs 8 virtual CPU devices")
        X, y = _blobs_for(kind, n=257, d=12, seed=12)
        kw = _fit_kwargs(kind)
        m1 = p.CSVM(kernel_type=kind, **kw).fit(
            p.DataSet(X, y), epsilon=1e-6
        )
        m8 = p.CSVM(
            kernel_type=kind, devices=cpu_devices[:8], **kw
        ).fit(p.DataSet(X, y), epsilon=1e-6)
        np.testing.assert_allclose(m1.alpha, m8.alpha, atol=5e-3)
        assert m1.rho == pytest.approx(m8.rho, abs=1e-3)


# ---------------------------------------------------------------------------
# the Pallas path runs sigmoid (a Gram kernel) end to end
# ---------------------------------------------------------------------------


class TestPallasSigmoid:
    def test_matvec_interpret_matches_xla(self):
        from jax.experimental.pallas import tpu as pltpu

        from plssvm_tpu.ops.matvec import kernel_matvec_xla
        from plssvm_tpu.ops.pallas_matvec import kernel_matvec_pallas

        rng = np.random.default_rng(13)
        X = rng.normal(size=(256, 128)).astype(np.float32)
        v = rng.normal(size=256).astype(np.float32)
        sq = jnp.asarray(np.sum(X * X, -1))
        args = (jnp.asarray(X), sq, jnp.asarray(v))
        kw = dict(kind=KT.SIGMOID, gamma=0.05, coef0=0.5, degree=3)
        with pltpu.force_tpu_interpret_mode():
            out_p = np.asarray(kernel_matvec_pallas(*args, **kw))
        out_x = np.asarray(kernel_matvec_xla(*args, row_block=128, **kw))
        np.testing.assert_allclose(out_p, out_x, rtol=1e-5, atol=1e-5)

    def test_distance_kernel_matvec_routing(self):
        # distance kernels now have their OWN fused Pallas walk
        # (ops/pallas_distance, round-6): the pallas impl routes supported
        # shapes there (checked in interpret mode — no TPU in CI) and
        # falls back to the XLA walk on unsupported (unpadded) rows; the
        # matmat (multiclass) path stays XLA for distance kernels
        from jax.experimental.pallas import tpu as pltpu

        from plssvm_tpu.solver.cg import (
            _make_kernel_matmat,
            _make_kernel_matvec,
        )

        rng = np.random.default_rng(14)
        X = np.abs(rng.normal(size=(128, 16))).astype(np.float32)
        sq = jnp.asarray(np.sum(X * X, -1))
        v = jnp.asarray(rng.normal(size=128).astype(np.float32))
        X_odd = X[:100]  # rows not a 128-multiple -> XLA fallback
        sq_odd = sq[:100]
        v_odd = v[:100]
        for kind in (KT.LAPLACIAN, KT.CHI_SQUARED):
            Ko = _oracle_matrix(X, X, kind, 0.2, 0.0, 3)
            kv = _make_kernel_matvec(kind, 3, "pallas", 64)
            with pltpu.force_tpu_interpret_mode():
                out = np.asarray(kv(jnp.asarray(X), sq, v, 0.2, 0.0))
            np.testing.assert_allclose(out, Ko @ np.asarray(v), rtol=1e-3)
            # unsupported shape: the XLA fallback must still be exact
            out_odd = np.asarray(
                kv(jnp.asarray(X_odd), sq_odd, v_odd, 0.2, 0.0)
            )
            Ko_odd = _oracle_matrix(X_odd, X_odd, kind, 0.2, 0.0, 3)
            np.testing.assert_allclose(
                out_odd, Ko_odd @ np.asarray(v_odd), rtol=1e-3
            )
            kmm = _make_kernel_matmat(kind, 3, 64, "pallas")
            V = jnp.stack([v, 2 * v], axis=1)
            # the multiclass matmat routes to the fused distance matmat
            # (round 6) — interpret mode on CPU
            with pltpu.force_tpu_interpret_mode():
                out2 = np.asarray(kmm(jnp.asarray(X), sq, V, 0.2, 0.0))
            np.testing.assert_allclose(
                out2, Ko @ np.asarray(V), rtol=1e-3
            )

    def test_sharded_impl_selection(self):
        # distance kernels ride the fused pallas ring on TPU meshes only;
        # here the devices are CPU (or None) -> XLA
        svm = p.CSVM(kernel_type="laplacian", gamma=0.1)
        svm.backend = p.BackendType.PALLAS  # force, regardless of host
        assert svm._sharded_impl(KT.LAPLACIAN, (256, 128), 2) == "xla"
        assert svm._sharded_impl(KT.CHI_SQUARED, (256, 128), 2) == "xla"


class TestDistancePredictRouting:
    def test_one_shot_path_never_serves_distance_kernels(self, monkeypatch):
        # the Gram-budget check does not model pairwise_distance memory, so
        # distance kernels must always stream through the blocked path
        import plssvm_tpu.csvm as csvm_mod

        X, y = _blobs_for(KT.LAPLACIAN, n=96, d=6)
        svm = p.CSVM(kernel_type="laplacian", gamma=0.2)
        model = svm.fit(p.DataSet(X, y), max_iter=30)

        def boom(*a, **k):
            raise AssertionError("one-shot predict used for a distance kernel")

        monkeypatch.setattr(csvm_mod, "predict_values_op", boom)
        acc = svm.score(model)  # must route through predict_values_blocked
        assert acc >= 0.9


class TestMultihostChiSquared:
    def test_fit_multihost_rejects_negative_data(self, tmp_path, cpu_devices):
        if len(cpu_devices) < 2:
            pytest.skip("needs virtual CPU devices")
        from plssvm_tpu.io.libsvm import write_libsvm_file

        X, y = make_blobs(64, 6, seed=20, dtype=np.float64)  # has negatives
        path = str(tmp_path / "neg.libsvm")
        write_libsvm_file(path, X, y)
        svm = p.CSVM(kernel_type="chi_squared", gamma=0.1,
                     devices=cpu_devices[:2])
        with pytest.raises(InvalidParameterError, match="non-negative"):
            svm.fit_multihost(path, max_iter=10)


class TestSymmetricDistanceWalk:
    """distance_kernel_matvec_sym == the plain blockwise scan."""

    @pytest.mark.parametrize("kind", NEW_KERNELS[1:], ids=str)
    @pytest.mark.parametrize("cols", [None, 3], ids=["matvec", "matmat"])
    @pytest.mark.parametrize("m,rb", [(512, 128), (128, 128), (256, 512)],
                             ids=["4-blocks", "1-block", "rb>m"])
    def test_matches_plain_scan(self, kind, cols, m, rb):
        from plssvm_tpu.ops.matvec import (
            distance_kernel_matvec_sym, kernel_matvec_xla,
        )

        rng = np.random.default_rng(21)
        X = np.abs(rng.normal(size=(m, 10))).astype(np.float32)
        shape = (m,) if cols is None else (m, cols)
        v = rng.normal(size=shape).astype(np.float32)
        sq = jnp.asarray(np.sum(X * X, -1))
        gamma = jnp.asarray(0.15, jnp.float32)
        sym = np.asarray(distance_kernel_matvec_sym(
            jnp.asarray(X), jnp.asarray(v), gamma, kind=kind, row_block=rb,
        ))
        plain = np.asarray(kernel_matvec_xla(
            jnp.asarray(X), sq, jnp.asarray(v),
            kind=kind, gamma=gamma, coef0=0.0, degree=3, row_block=rb,
        ))
        np.testing.assert_allclose(sym, plain, rtol=1e-4, atol=1e-4)
