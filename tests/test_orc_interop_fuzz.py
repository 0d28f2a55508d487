"""Two-direction ORC interop fuzz: random schemas through BOTH external
oracles.

Direction A: ``orc_file.write_orc`` -> Apache ORC C++ (pyarrow.orc)
reads it back equal, AND the repo's own reader (``orc_read.read_orc``)
agrees.
Direction B: Apache writes the table -> the repo's reader reproduces
Apache's own read of the same bytes.

Random column trees (ints in the four RLEv2-splitting distributions,
floats, low/high-cardinality + unicode strings, binary, date,
timestamp, decimal, list/map/struct to depth 2), null densities
{0, 0.05, 0.5, 0.95}, both RLE modes, all five block compressions
(incl. the pure-Python lz4 read path), random stripe sizes. Half the
bloom-eligible trials carry BLOOM_FILTER_UTF8 streams in BOTH
directions (our writer's and Apache's, via raw preorder column IDs),
each checked with a sampled-needle point read that must lose no rows
through the stats+bloom stripe pruning.

Default is a quick 12-trial smoke so the suite stays fast; the
round-5 deep run was 1,260 trials / 0 failures (seeds 1, 2, 7, 42 —
SURVEY.md §2.7). Scale with ORC_FUZZ_TRIALS=400 ORC_FUZZ_SEED=7.
"""

import os
import random
import tempfile

import numpy as np
import pyarrow as pa
import pyarrow.orc as po
import pytest

from orc_format_spark.sources.orc_file import write_orc
from orc_format_spark.sources.orc_read import read_orc

N_TRIALS = int(os.environ.get("ORC_FUZZ_TRIALS", "12"))
SEED = int(os.environ.get("ORC_FUZZ_SEED", "1"))


def _rand_nulls(rng, vals, n, density, typ=None):
    if density <= 0:
        return pa.array(vals, type=typ)
    mask = rng.random(n) < density
    if mask.all() and n:
        mask[int(rng.integers(0, n))] = False  # keep at least one value
    return pa.array(vals, type=typ, mask=mask)


def _gen_column(rng, n, depth=0):
    kinds = [
        "i64", "i32", "i16", "i8", "bool", "f32", "f64", "str_low",
        "str_high", "str_unicode", "binary", "date", "ts", "dec12",
    ]
    if depth < 2:
        kinds += ["list", "struct", "map"]
    k = random.choice(kinds)
    density = random.choice([0.0, 0.0, 0.05, 0.5, 0.95])
    if k == "i64":
        dist = random.choice(["uniform", "sorted", "runs", "patched",
                              "const"])
        if dist == "uniform":
            v = rng.integers(-(2**62), 2**62, n)
        elif dist == "sorted":
            v = np.sort(rng.integers(-(2**40), 2**40, n))
        elif dist == "runs":
            v = np.repeat(rng.integers(-(2**30), 2**30, n // 5 + 1), 5)[:n]
        elif dist == "patched":
            v = rng.integers(0, 2**10, n)
            if n:
                v[rng.integers(0, n, max(1, n // 50))] = rng.integers(
                    2**50, 2**62
                )
        else:
            v = np.full(n, int(rng.integers(-(2**62), 2**62)))
        return _rand_nulls(rng, v.astype(np.int64), n, density), pa.int64()
    if k == "i32":
        return (_rand_nulls(rng, rng.integers(-(2**31), 2**31, n)
                            .astype(np.int32), n, density), pa.int32())
    if k == "i16":
        return (_rand_nulls(rng, rng.integers(-(2**15), 2**15, n)
                            .astype(np.int16), n, density), pa.int16())
    if k == "i8":
        return (_rand_nulls(rng, rng.integers(-128, 128, n)
                            .astype(np.int8), n, density), pa.int8())
    if k == "bool":
        return (_rand_nulls(rng, rng.integers(0, 2, n).astype(bool), n,
                            density), pa.bool_())
    if k in ("f32", "f64"):
        v = rng.standard_normal(n) * 10.0 ** float(rng.integers(-8, 8))
        if k == "f32":
            return _rand_nulls(rng, v.astype(np.float32), n, density), \
                pa.float32()
        return _rand_nulls(rng, v, n, density), pa.float64()
    if k == "str_low":
        v = [f"name-{int(i) % 17}" for i in rng.integers(0, 1 << 30, n)]
        return _rand_nulls(rng, v, n, density, pa.string()), pa.string()
    if k == "str_high":
        v = [f"u-{int(i)}" for i in rng.integers(0, 1 << 60, n)]
        return _rand_nulls(rng, v, n, density, pa.string()), pa.string()
    if k == "str_unicode":
        pool = ["", "héllo", "日本語テキスト", "emoji 🎉🚀", "tab\tnl\n",
                "a" * 300]
        v = [random.choice(pool) for _ in range(n)]
        return _rand_nulls(rng, v, n, density, pa.string()), pa.string()
    if k == "binary":
        v = [rng.bytes(int(rng.integers(0, 40))) for _ in range(n)]
        return _rand_nulls(rng, v, n, density, pa.binary()), pa.binary()
    if k == "date":
        v = rng.integers(-20000, 40000, n).astype("int32")
        return (_rand_nulls(rng, v, n, density).cast(pa.date32()),
                pa.date32())
    if k == "ts":
        sec = rng.integers(-(10**10), 10**10, n)  # +-317y around epoch
        v = sec * 10**9 + rng.integers(0, 10**9, n)
        return (_rand_nulls(rng, v, n, density).cast(pa.timestamp("ns")),
                pa.timestamp("ns"))
    if k == "dec12":
        import decimal

        v = [None if rng.random() < density else decimal.Decimal(
                f"{int(rng.integers(-(10**10), 10**10))}."
                f"{int(rng.integers(0, 100)):02d}")
             for _ in range(n)]
        return pa.array(v, pa.decimal128(12, 2)), pa.decimal128(12, 2)
    if k == "list":
        lens = rng.integers(0, 5, n)
        child, ct = _gen_column(rng, int(lens.sum()), depth + 1)
        offsets = np.zeros(n + 1, np.int32)
        np.cumsum(lens, out=offsets[1:])
        return (pa.ListArray.from_arrays(pa.array(offsets, pa.int32()),
                                         child), pa.list_(ct))
    if k == "struct":
        a, at = _gen_column(rng, n, depth + 1)
        b, bt = _gen_column(rng, n, depth + 1)
        return (pa.StructArray.from_arrays([a, b], ["a", "b"]),
                pa.struct([("a", at), ("b", bt)]))
    if k == "map":
        lens = rng.integers(0, 4, n)
        total = int(lens.sum())
        keys = pa.array([f"k{int(i)}" for i in rng.integers(0, 50, total)],
                        pa.string())
        items, it = _gen_column(rng, total, depth + 1)
        offsets = np.zeros(n + 1, np.int32)
        np.cumsum(lens, out=offsets[1:])
        return (pa.MapArray.from_arrays(pa.array(offsets, pa.int32()),
                                        keys, items),
                pa.map_(pa.string(), it))
    raise AssertionError(k)


@pytest.mark.parametrize("trial", range(N_TRIALS))
def test_orc_interop_fuzz(trial):
    rng = np.random.default_rng(SEED * 100_003 + trial)
    random.seed(trial * 7 + 3)
    n = int(rng.integers(0, 6000))
    cols = {}
    for ci in range(int(rng.integers(1, 5))):
        arr, _typ = _gen_column(rng, n)
        cols[f"c{ci}"] = arr
    t = pa.table(cols)
    rle = random.choice(["v1", "v2"])
    comp = random.choice(["none", "zlib", "snappy", "zstd", "lz4"])
    stripe_rows = int(rng.integers(50, 4000))

    # ~half the trials also carry BLOOM_FILTER_UTF8 streams on every
    # eligible top-level column, so the bloom writer rides the whole
    # random-schema / compression / rle / stripe-size matrix
    eligible = [
        f.name for f in t.schema
        if pa.types.is_integer(f.type) or pa.types.is_date32(f.type)
        or pa.types.is_string(f.type) or pa.types.is_large_string(f.type)
        or pa.types.is_binary(f.type)
    ]
    bloom = eligible if (eligible and random.random() < 0.5) else []

    # Direction A: our writer -> Apache reader AND our own reader
    pth = tempfile.mktemp(suffix=".orc")
    try:
        write_orc(t, pth, rle=rle, compression=comp,
                  stripe_rows=stripe_rows, bloom_columns=bloom or None)
        assert po.ORCFile(pth).read().cast(t.schema).equals(t), \
            (trial, "A-apache", rle, comp)
        assert read_orc(pth).cast(t.schema).equals(t), \
            (trial, "A-native", rle, comp)

        # nested projection rides the same random matrix: one random
        # struct leaf path per eligible trial, pruned read == full
        # table pruned python-side (floats here are finite, so pylist
        # equality is exact)
        def _leaf_paths(prefix, typ):
            if pa.types.is_struct(typ):
                out = []
                for f in typ:
                    out += _leaf_paths(f"{prefix}.{f.name}", f.type)
                return out
            return [prefix]

        nested = []
        for f in t.schema:
            if pa.types.is_struct(f.type):
                nested += [p for p in _leaf_paths(f.name, f.type)
                           if "." in p]
        if nested and n:
            path = nested[int(rng.integers(0, len(nested)))]
            parts = path.split(".")

            def _prune(v, ps):
                if not ps or v is None:
                    return v
                return {ps[0]: _prune(v[ps[0]], ps[1:])}

            gotp = read_orc(pth, columns=[path])
            want = [_prune(r, parts[1:])
                    for r in t.column(parts[0]).to_pylist()]
            assert gotp.column(parts[0]).to_pylist() == want, \
                (trial, "A-proj", path)

            # nested-predicate leg: a sampled needle on an int/string
            # struct leaf must survive the stats/bloom pruning (the
            # pruned read is a row superset of the exact matches)
            def _leaf_vals(v, ps):
                if v is None:
                    return []
                if isinstance(v, list):
                    out = []
                    for e in v:
                        out += _leaf_vals(e, ps)
                    return out
                if not ps:
                    return [v] if v is not None else []
                return _leaf_vals(v.get(ps[0]), ps[1:])

            leafvals = []
            for r in t.column(parts[0]).to_pylist():
                leafvals += _leaf_vals(r, parts[1:])
            leafvals = [v for v in leafvals
                        if isinstance(v, (int, str))
                        and not isinstance(v, bool)]
            if leafvals:
                needle = leafvals[int(rng.integers(0, len(leafvals)))]
                gp = read_orc(pth, predicate=(path, "==", needle))
                n_got = sum(
                    1 for r in gp.column(parts[0]).to_pylist()
                    if needle in _leaf_vals(r, parts[1:])
                )
                n_want = sum(
                    1 for r in t.column(parts[0]).to_pylist()
                    if needle in _leaf_vals(r, parts[1:])
                )
                assert n_got == n_want, (trial, "A-nested-pred", path,
                                         needle)
        # bloom-pruned point read must not LOSE rows: for one sampled
        # needle per int/string bloom column, the exact filter over the
        # pruned superset matches the exact filter over the full table
        import pyarrow.compute as pc
        for bc in bloom:
            ft = t.schema.field(bc).type
            if not (pa.types.is_integer(ft) or pa.types.is_string(ft)):
                continue
            vals = t.column(bc).drop_null()
            if len(vals) == 0:
                continue
            v = vals[int(rng.integers(0, len(vals)))].as_py()
            got = read_orc(pth, predicate=(bc, "==", v))
            n_got = got.filter(
                pc.fill_null(pc.equal(got.column(bc), v), False)
            ).num_rows
            n_want = t.filter(
                pc.fill_null(pc.equal(t.column(bc), v), False)
            ).num_rows
            assert n_got == n_want, (trial, "A-bloom", bc, v)
    finally:
        if os.path.exists(pth):
            os.unlink(pth)

    # Direction B: Apache writer -> our reader matches Apache's read.
    # Half the bloom-eligible trials also ask Apache to write bloom
    # filters (pyarrow takes raw preorder ORC column IDs), so the
    # CONSUMPTION side rides the same random matrix: a sampled-needle
    # point read through our stats+bloom pruning must lose no rows.
    def _orc_nodes(typ) -> int:
        if pa.types.is_list(typ) or pa.types.is_large_list(typ):
            return 1 + _orc_nodes(typ.value_type)
        if pa.types.is_struct(typ):
            return 1 + sum(_orc_nodes(f.type) for f in typ)
        if pa.types.is_map(typ):
            return 1 + _orc_nodes(typ.key_type) + _orc_nodes(typ.item_type)
        return 1

    bloom_ids, bloom_names, cid = [], [], 1
    for f in t.schema:
        if f.name in eligible:
            bloom_ids.append(cid)
            bloom_names.append(f.name)
        cid += _orc_nodes(f.type)
    if not bloom_ids or random.random() < 0.5:
        bloom_ids, bloom_names = [], []

    pth2 = tempfile.mktemp(suffix=".orc")
    bcomp = random.choice(["uncompressed", "zlib", "snappy", "zstd", "lz4"])
    try:
        po.write_table(t, pth2, compression=bcomp,
                       stripe_size=max(1024, int(rng.integers(1, 64)) * 4096),
                       bloom_filter_columns=bloom_ids or None)
        expect = po.ORCFile(pth2).read()
        assert read_orc(pth2).cast(expect.schema).equals(expect), \
            (trial, "B", bcomp)
        import pyarrow.compute as pc
        for bc in bloom_names:
            ft = t.schema.field(bc).type
            if not (pa.types.is_integer(ft) or pa.types.is_string(ft)):
                continue
            vals = t.column(bc).drop_null()
            if len(vals) == 0:
                continue
            v = vals[int(rng.integers(0, len(vals)))].as_py()
            got = read_orc(pth2, predicate=(bc, "==", v))
            n_got = got.filter(
                pc.fill_null(pc.equal(got.column(bc), v), False)
            ).num_rows
            n_want = t.filter(
                pc.fill_null(pc.equal(t.column(bc), v), False)
            ).num_rows
            assert n_got == n_want, (trial, "B-bloom", bc, v)
    finally:
        if os.path.exists(pth2):
            os.unlink(pth2)
