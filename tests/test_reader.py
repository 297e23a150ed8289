"""Chain ingestion tests: file resolution, parsing (native + fallback),
dict/array sources (reference loader semantics, MCEvidence.py:567-606)."""

import os
import numpy as np
import pytest

from mcevidence_tpu.chains import reader
from mcevidence_tpu.native import chainload


@pytest.fixture
def chain_files(tmp_path, rng):
    arrs = []
    for c in (1, 2, 3):
        a = np.column_stack([np.ones(50), rng.random(50),
                             rng.normal(size=(50, 3))])
        np.savetxt(tmp_path / f"root_{c}.txt", a)
        arrs.append(a)
    return str(tmp_path / "root"), arrs


def test_resolve_default_glob(chain_files):
    root, _ = chain_files
    flist = reader.resolve_chain_files(root)
    assert [f.endswith(f"root_{i}.txt") for i, f in enumerate(flist, 1)]
    assert len(flist) == 3


def test_resolve_idchain(chain_files):
    root, _ = chain_files
    flist = reader.resolve_chain_files(root, idchain=2)
    assert len(flist) == 1 and flist[0].endswith("root_2.txt")


def test_resolve_wildcard(chain_files):
    root, _ = chain_files
    flist = reader.resolve_chain_files(root + "_*.txt")
    assert len(flist) == 3


def test_resolve_single_file_and_list(chain_files):
    root, _ = chain_files
    f1 = root + "_1.txt"
    assert reader.resolve_chain_files(f1) == [f1]
    assert reader.resolve_chain_files([f1, f1]) == [f1, f1]


def test_resolve_missing_raises(tmp_path):
    with pytest.raises(FileNotFoundError):
        reader.resolve_chain_files(str(tmp_path / "nope"))


def test_parse_matches_loadtxt(chain_files):
    root, arrs = chain_files
    got = reader.parse_chain_file(root + "_1.txt")
    np.testing.assert_allclose(got, arrs[0], rtol=1e-15)


def test_native_loader_if_built(tmp_path, rng):
    a = rng.normal(size=(40, 5))
    p = tmp_path / "t.txt"
    np.savetxt(p, a, fmt="%.17g")
    got = chainload.load_table(str(p))
    if got is None:
        pytest.skip("native chainload not built in this environment")
    np.testing.assert_allclose(got, a, rtol=0, atol=0)


def test_native_loader_comments_and_blanks(tmp_path):
    p = tmp_path / "t.txt"
    p.write_text("# header\n\n 1 2 3\n# mid\n4 5 6\n\n")
    got = chainload.load_table(str(p))
    if got is None:
        pytest.skip("native chainload not built")
    np.testing.assert_array_equal(got, [[1, 2, 3], [4, 5, 6]])


def test_native_loader_ragged_rejected(tmp_path):
    p = tmp_path / "t.txt"
    p.write_text("1 2 3\n4 5\n")
    got = chainload.load_table(str(p))
    if chainload._get_lib() is None:
        pytest.skip("native chainload not built")
    assert got is None   # caller falls back to pandas, which then errors


def test_dict_chain_keys(rng):
    s = rng.normal(size=(20, 3))
    lnl = rng.normal(size=20)
    cols = reader._dict_to_columns({"samples": s, "loglikes": lnl})
    assert cols.shape == (20, 5)
    np.testing.assert_array_equal(cols[:, 0], 1.0)           # default weights
    np.testing.assert_allclose(cols[:, 1], -lnl)             # stored as -lnL
    w = rng.random(20)
    cols = reader._dict_to_columns({"samples": s, "loglikes": lnl,
                                    "weights": w})
    np.testing.assert_allclose(cols[:, 0], w)
    with pytest.raises(KeyError):
        reader._dict_to_columns({"loglikes": lnl})


def test_ingest_end_to_end(chain_files):
    root, arrs = chain_files
    pair = reader.ingest(root, burnlen=10)
    assert pair.s1.nsamples == 3 * 40
    assert pair.s1.ndim == 3


def test_getdist_style_object(rng):
    # duck-typed getdist MCSamples: .samples, .loglikes (= -lnL), .weights
    class FakeGetdist:
        pass

    g = FakeGetdist()
    g.samples = rng.normal(size=(30, 3))
    g.loglikes = rng.random(30)          # getdist stores -lnL
    g.weights = rng.integers(1, 4, 30).astype(float)
    chains = reader.load_chains(g)
    assert len(chains) == 1 and chains[0].shape == (30, 5)
    np.testing.assert_allclose(chains[0][:, 0], g.weights)
    np.testing.assert_allclose(chains[0][:, 1], g.loglikes)  # stays -lnL
    # works end-to-end through the facade
    from mcevidence_tpu import MCEvidence
    out = MCEvidence(g, kmax=2, verbose=0, engine="xla").evidence()
    assert np.isfinite(out).all()

    g2 = FakeGetdist()
    g2.samples = rng.normal(size=(20, 2))
    g2.loglikes = rng.random(20)
    g2.weights = None
    chains = reader.load_chains(g2)
    np.testing.assert_array_equal(chains[0][:, 0], 1.0)


def _stub_getdist_module(monkeypatch):
    """Register a minimal stand-in for the real getdist package: pins the
    package-path attribute contract (.samples, .loglikes = -lnL, .weights
    ALWAYS an array — getdist defaults it to ones) without needing the
    package installed (VERDICT r3 item 8; reference MCEvidence.py:45-59)."""
    import sys
    import types

    mod = types.ModuleType("getdist")

    class MCSamples:
        def __init__(self, samples=None, loglikes=None, weights=None):
            self.samples = np.atleast_2d(np.asarray(samples, np.float64))
            self.loglikes = (None if loglikes is None
                             else np.asarray(loglikes, np.float64))
            # the real package never leaves weights as None
            self.weights = (np.ones(len(self.samples)) if weights is None
                            else np.asarray(weights, np.float64))

    mod.MCSamples = MCSamples
    sub = types.ModuleType("getdist.mcsamples")
    sub.MCSamples = MCSamples
    mod.mcsamples = sub
    monkeypatch.setitem(sys.modules, "getdist", mod)
    monkeypatch.setitem(sys.modules, "getdist.mcsamples", sub)
    return MCSamples


def test_getdist_package_isinstance_branch(rng, monkeypatch):
    MCSamplesCls = _stub_getdist_module(monkeypatch)
    s = rng.normal(size=(40, 3))
    neg_lnl = rng.random(40)
    w = rng.integers(1, 4, 40).astype(float)
    g = MCSamplesCls(samples=s, loglikes=neg_lnl, weights=w)
    chains = reader.load_chains(g)
    assert len(chains) == 1 and chains[0].shape == (40, 5)
    np.testing.assert_allclose(chains[0][:, 0], w)
    np.testing.assert_allclose(chains[0][:, 1], neg_lnl)   # stays -lnL
    np.testing.assert_allclose(chains[0][:, 2:], s)
    # same numbers as the explicit dict path (sign convention: dict
    # loglikes are +lnL, getdist loglikes are -lnL)
    from mcevidence_tpu import MCEvidence
    a = MCEvidence(g, kmax=2, verbose=0, engine="xla").evidence()
    b = MCEvidence({"samples": s, "loglikes": -neg_lnl, "weights": w},
                   kmax=2, verbose=0, engine="xla").evidence()
    np.testing.assert_allclose(a, b, atol=1e-12)


def test_getdist_package_loglikes_none_is_clear_error(rng, monkeypatch):
    MCSamplesCls = _stub_getdist_module(monkeypatch)
    g = MCSamplesCls(samples=rng.normal(size=(10, 2)))
    with pytest.raises(ValueError, match="loglikes=None"):
        reader.load_chains(g)


def test_native_loader_fortran_exponent(tmp_path):
    p = tmp_path / "f.txt"
    p.write_text("1.5d2 -2.5D-1\n")
    got = chainload.load_table(str(p))
    if got is None:
        pytest.skip("native chainload not built")
    np.testing.assert_allclose(got, [[150.0, -0.25]])


def test_native_loader_page_aligned_no_trailing_newline(tmp_path):
    # a fallback-path token ending exactly at a page boundary with no
    # trailing newline: strtod on the raw mmap would read out of bounds
    tok = "1.2345678901234567890e-300"
    tail = "1.0 2.0 " + tok
    pad = (-(len(tail) + 2)) % 4096
    p = tmp_path / "page.txt"
    p.write_text("#" + "x" * pad + "\n" + tail)
    assert p.stat().st_size % 4096 == 0
    got = chainload.load_table(str(p))
    if got is None:
        pytest.skip("native chainload not built")
    np.testing.assert_array_equal(got, np.loadtxt(str(p)).reshape(1, -1))


def test_native_loader_overlong_token_rejected(tmp_path):
    # a token longer than the parser's 128-byte fallback buffer must reject
    # the file (truncating would silently parse the tail as extra columns
    # or wrong values), leaving the caller to np.loadtxt which handles it
    tok = "1." + "0" * 200 + "5e0"
    p = tmp_path / "long.txt"
    p.write_text(f"1.0 {tok}\n2.0 3.0\n")
    got = chainload.load_table(str(p))
    if chainload._get_lib() is None:
        pytest.skip("native chainload not built")
    assert got is None
    np.testing.assert_allclose(np.loadtxt(str(p)),
                               [[1.0, float(tok)], [2.0, 3.0]])


def test_native_loader_format_fuzz(tmp_path, rng):
    """Randomized format sweep vs np.loadtxt: mixed fixed/exponent notation,
    CRLF, leading whitespace, huge/tiny exponents, special tokens."""
    if chainload._get_lib() is None:
        pytest.skip("native chainload not built")
    fmts = ["%.17g", "%.6f", "%.3e", "%.15E", "%24.16e", "%.0f"]
    for trial in range(12):
        a = rng.normal(size=(rng.integers(1, 30), rng.integers(1, 8)))
        a *= 10.0 ** rng.integers(-250, 250, size=a.shape)
        if trial % 3 == 0:
            a[rng.integers(a.shape[0]), rng.integers(a.shape[1])] = np.inf
            a[rng.integers(a.shape[0]), rng.integers(a.shape[1])] = -np.inf
        fmt = fmts[trial % len(fmts)]
        newline = "\r\n" if trial % 2 else "\n"
        lines = [" " * (trial % 3)
                 + (" " * (1 + trial % 2)).join(fmt % v for v in row)
                 for row in a]
        p = tmp_path / f"fz{trial}.txt"
        p.write_bytes((newline.join(lines) + newline).encode())
        got = chainload.load_table(str(p))
        overlong = max(len(fmt % v) for row in a for v in row) > 127
        if overlong:     # e.g. %.6f of 1e249: must reject, not truncate
            assert got is None, (trial, fmt)
            continue
        assert got is not None, (trial, fmt)
        want = np.loadtxt(str(p)).reshape(a.shape)
        np.testing.assert_array_equal(got, want, err_msg=f"{trial} {fmt}")


def test_parse_cache_roundtrip_and_invalidation(tmp_path):
    import time as _time

    from mcevidence_tpu.chains import reader

    f = tmp_path / "chain_1.txt"
    f.write_text("1 0.5 1.0 2.0\n1 0.7 1.1 2.1\n")
    cdir = tmp_path / "pcache"
    reader.set_parse_cache(str(cdir))
    try:
        a = reader.parse_chain_file(str(f))
        cached = list(cdir.glob("*.npy"))
        assert len(cached) == 1
        b = reader.parse_chain_file(str(f))       # served from cache
        np.testing.assert_array_equal(a, b)
        # invalidation: appending a row changes size -> new cache entry
        _time.sleep(0.01)
        with open(f, "a") as fp:
            fp.write("1 0.9 1.2 2.2\n")
        c = reader.parse_chain_file(str(f))
        assert c.shape[0] == 3
        assert len(list(cdir.glob("*.npy"))) == 2
    finally:
        reader.set_parse_cache(None)


def _fake_idata(rng, nchain=2, ndraw=400, ndim=3, with_ll=True):
    """Duck-typed stand-in for an ArviZ InferenceData (arviz/xarray are not
    installed here; the reader only touches .posterior/.log_likelihood
    .data_vars mappings of objects with .values)."""
    from types import SimpleNamespace

    class Var(SimpleNamespace):
        pass

    theta = rng.normal(size=(nchain, ndraw, ndim - 1))
    extra = rng.normal(size=(nchain, ndraw))            # scalar variable
    ll = rng.normal(size=(nchain, ndraw, 7))            # pointwise log-lik
    post = SimpleNamespace(data_vars={
        "beta": Var(values=theta), "sigma": Var(values=extra)})
    groups = dict(posterior=post)
    if with_ll:
        groups["log_likelihood"] = SimpleNamespace(
            data_vars={"y": Var(values=ll)})
    idata = SimpleNamespace(**groups)
    return idata, theta, extra, ll


def test_inferencedata_duck_ingestion(rng):
    from mcevidence_tpu.chains.reader import load_chains
    idata, theta, extra, ll = _fake_idata(rng)
    chains = load_chains(idata)
    assert len(chains) == 2                    # one matrix per MCMC chain
    for c in range(2):
        m = chains[c]
        assert m.shape == (400, 2 + 3)
        np.testing.assert_allclose(m[:, 0], 1.0)            # unit weights
        np.testing.assert_allclose(m[:, 1], -ll[c].sum(axis=1))
        np.testing.assert_allclose(m[:, 2:4], theta[c])     # var order kept
        np.testing.assert_allclose(m[:, 4], extra[c])


def test_inferencedata_requires_log_likelihood(rng):
    from mcevidence_tpu.chains.reader import load_chains
    idata, *_ = _fake_idata(rng, with_ll=False)
    with pytest.raises(ValueError, match="log_likelihood"):
        load_chains(idata)


def test_inferencedata_end_to_end_evidence(rng):
    # iid Gaussian posterior shipped as a fake InferenceData: lnZ -> -lnV=0
    from types import SimpleNamespace
    from mcevidence_tpu.evidence import MCEvidence
    nchain, ndraw, ndim = 2, 3000, 4
    theta = rng.normal(0.0, 0.05, size=(nchain, ndraw, ndim))
    ll = (-0.5 * np.sum((theta / 0.05) ** 2, axis=2)
          - ndim * 0.5 * np.log(2 * np.pi) - ndim * np.log(0.05))
    idata = SimpleNamespace(
        posterior=SimpleNamespace(
            data_vars={"x": SimpleNamespace(values=theta)}),
        log_likelihood=SimpleNamespace(
            data_vars={"y": SimpleNamespace(values=ll[..., None])}))
    mle = MCEvidence(idata, kmax=2, verbose=0, engine="xla").evidence()
    assert abs(mle[0]) < 0.15, mle


def test_inferencedata_rejects_wrong_dims(rng):
    from types import SimpleNamespace
    from mcevidence_tpu.chains.reader import load_chains
    idata = SimpleNamespace(posterior=SimpleNamespace(data_vars={
        "x": SimpleNamespace(values=rng.normal(size=(100, 2)),
                             dims=("draw", "chain"))}))
    with pytest.raises(ValueError, match="chain, draw"):
        load_chains(idata)


def test_parse_cache_corrupt_entry_reparsed(tmp_path, caplog):
    # a truncated/corrupt .npy cache entry must fall back to re-parsing
    import logging
    from mcevidence_tpu.chains import reader
    f = tmp_path / "c_1.txt"
    np.savetxt(f, np.arange(12.0).reshape(3, 4))
    cdir = tmp_path / "pc"
    reader.set_parse_cache(str(cdir))
    try:
        a = reader.parse_chain_file(str(f))
        entry = list(cdir.glob("*.npy"))[0]
        entry.write_bytes(b"garbage")
        with caplog.at_level(logging.WARNING):
            b = reader.parse_chain_file(str(f))
        np.testing.assert_array_equal(a, b)
        assert any("cache read failed" in r.message for r in caplog.records)
    finally:
        reader.set_parse_cache(None)


def test_parse_cache_concurrent_writers(tmp_path):
    # serve --workers N can parse the SAME file from multiple threads with
    # the parse cache on: per-writer tmp names + atomic publish must never
    # corrupt the cache entry or the returned arrays
    from concurrent.futures import ThreadPoolExecutor

    f = tmp_path / "cc_1.txt"
    want = np.arange(400.0).reshape(50, 8)
    np.savetxt(f, want)
    reader.set_parse_cache(str(tmp_path / "pc"))
    try:
        with ThreadPoolExecutor(max_workers=4) as pool:
            outs = list(pool.map(
                lambda _: reader.parse_chain_file(str(f)), range(8)))
        for o in outs:
            np.testing.assert_array_equal(o, want)
        # the published entry is intact and served on the next read
        np.testing.assert_array_equal(reader.parse_chain_file(str(f)), want)
        leftovers = list((tmp_path / "pc").glob("*.tmp.npy"))
        assert not leftovers, leftovers
    finally:
        reader.set_parse_cache(None)


def test_root_in_glob_metachar_dir(tmp_path, rng):
    """REGRESSION (round-4 review): a chain root inside a directory with
    glob metacharacters ([ ]) used to misfire as a character class and
    miss the files; the root must be glob-escaped (only idpattern's own
    wildcards expand)."""
    d = tmp_path / "runs[2026]"
    d.mkdir()
    chain = np.column_stack([np.ones(20), np.ones(20),
                             rng.normal(size=(20, 2))])
    np.savetxt(d / "toy_1.txt", chain)
    np.savetxt(d / "toy_2.txt", chain)
    from mcevidence_tpu.chains.reader import resolve_chain_files
    flist = resolve_chain_files(str(d / "toy"))
    assert [os.path.basename(f) for f in flist] == ["toy_1.txt", "toy_2.txt"]


def test_glob_order_deterministic_q14(tmp_path, rng):
    """Quirk Q14: the reference concatenated chain files in raw readdir
    order, so integer thinning retained different rows machine-to-machine.
    Here the glob is sorted: ingestion must be identical however the files
    were created/ordered on disk."""
    import numpy as np

    from mcevidence_tpu.chains import reader
    rows = {c: np.column_stack([np.full(40, 2.0), rng.random(40),
                                rng.normal(size=(40, 2))])
            for c in (1, 2, 3)}
    # create in scrambled order to perturb readdir
    for c in (2, 3, 1):
        np.savetxt(tmp_path / f"t_{c}.txt", rows[c])
    pair = reader.ingest(str(tmp_path / "t"), thinlen=3)
    expect = np.concatenate([rows[1], rows[2], rows[3]])[:, 2:]
    # thinning is deterministic for integer weights; row ORDER before
    # thinning is pinned to the sorted file order
    pair_again = reader.ingest(str(tmp_path / "t"), thinlen=3)
    np.testing.assert_array_equal(pair.s1.samples, pair_again.s1.samples)
    assert pair.s1.samples.shape[1] == 2
    # the first retained row comes from chain 1 (sorted first), not from
    # whichever file readdir happened to yield
    assert np.any(np.all(expect[:1] == pair.s1.samples[:1], axis=1))


def test_inmemory_burn_thin_applied_q15(rng):
    """Quirk Q15: the reference silently IGNORED burnlen/thinlen for
    dict/array (in-memory) chains — only file inputs were burned/thinned.
    This build applies them uniformly to every source type."""
    import numpy as np

    from mcevidence_tpu.chains import reader
    n = 200
    chain = {"samples": rng.normal(size=(n, 3)),
             "loglikes": rng.normal(size=n)}
    pair = reader.ingest(chain, burnlen=0.25)
    assert pair.s1.nsamples == 150          # 25% burned
    pair = reader.ingest(chain, burnlen=0.25, thinlen=2.0)
    # unit weights, factor 2: the getdist walk keeps ~half the burned rows,
    # exactly as many as the thinning primitive itself says
    from mcevidence_tpu.chains.preprocess import get_thin_index
    _, ix = get_thin_index(2.0, np.ones(150))
    assert pair.s1.nsamples == len(ix) < 150
