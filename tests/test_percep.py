"""Round-12 tests: perceptual fingerprints (image dHash, audio
sign-delta), the banded exact-Hamming matcher, label propagation, and
the mixed-merge rollup behind the streaming substring scrub."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from hdfs_stream_processing_spark.operators.dedup import banded_hamming_pairs
from hdfs_stream_processing_spark.operators.graph import label_propagation
from hdfs_stream_processing_spark.operators.incremental import rollup_merge_mixed
from hdfs_stream_processing_spark.operators.llmdata import (
    scrub_spans,
    scrub_with_keepers,
    token_shingles,
)
from hdfs_stream_processing_spark.operators.multimodal import (
    audio_fingerprint,
    dhash_bands,
    decode_image,
    encode_bmp,
    encode_wav,
    decode_audio,
    resample_audio,
    resize_image,
)


# ── fixtures: the same block textures the percep queries stage ──────────


def _tex_image(n: int) -> np.ndarray:
    w, h = 96 + (n % 7) * 8, 64 + (n % 5) * 8
    x, y = np.arange(w), np.arange(h)
    xx, yy = np.meshgrid(x, y)
    u, v = (xx * 16) // w, (yy * 16) // h
    r = (u * (73 + 11 * n) + v * (149 + 7 * n) + u * v * (37 + 3 * n) + n * 101) % 251
    g = (u * (97 + 13 * n) + v * (59 + 5 * n) + u * v * (41 + 9 * n) + n * 67) % 251
    b = (u * (113 + 17 * n) + v * (31 + 19 * n) + u * v * (29 + 23 * n) + n * 139) % 251
    return np.stack([r, g, b], axis=-1).astype(np.uint8)


def _block_wave(n: int) -> np.ndarray:
    length = 6000 + (n % 17) * 192
    i = np.arange(length, dtype=np.int64)
    u = (i * 120) // length
    return (((u * (37 + 5 * n) + u * u * (11 + 3 * n) + n * 71) % 401) - 200).astype(
        np.int16
    )


def _ref_dhash_bits(img: np.ndarray, grid: int = 16) -> np.ndarray:
    lum = (
        299 * img[:, :, 0].astype(np.int64)
        + 587 * img[:, :, 1].astype(np.int64)
        + 114 * img[:, :, 2].astype(np.int64)
    ) // 1000
    h, w = lum.shape
    xs = (np.arange(grid + 1) * w) // (grid + 1)
    ys = (np.arange(grid) * h) // grid
    g = lum[np.ix_(ys, xs)]
    return (g[:, 1:] > g[:, :-1]).astype(np.int64).ravel()


def _decoded_imgs(spark, ns):
    rows = [(f"src{n}", bytearray(encode_bmp(_tex_image(n)))) for n in ns]
    df = spark.createDataFrame(rows, "source string, payload binary")
    return decode_image(df, id_col="source", payload_col="payload", id_type="string")


def _decoded_waves(spark, ns):
    rows = [(f"src{n}", bytearray(encode_wav(_block_wave(n), 8000))) for n in ns]
    df = spark.createDataFrame(rows, "source string, payload binary")
    return decode_audio(df, id_col="source", payload_col="payload", id_type="string")


# ── dhash_bands ─────────────────────────────────────────────────────────


def test_dhash_bands_matches_reference_bits(spark):
    got = {
        r["source"]: tuple(r[f"b{j}"] for j in range(8))
        for r in dhash_bands(
            _decoded_imgs(spark, range(4)), id_col="source", id_type="string"
        ).collect()
    }
    for n in range(4):
        bits = _ref_dhash_bits(_tex_image(n))
        want = tuple(
            int((bits[j * 32 : (j + 1) * 32] << np.arange(32)).sum())
            for j in range(8)
        )
        assert got[f"src{n}"] == want


def test_dhash_bands_validates():
    with pytest.raises(ValueError, match="divide"):
        dhash_bands(None, grid=8, n_bands=5)
    with pytest.raises(ValueError, match="grid"):
        dhash_bands(None, grid=1)


def test_audio_fingerprint_default_is_128_bits():
    # the r13 scale parameterization: 128 bits in 8 x 16-bit bands
    import inspect

    sig = inspect.signature(audio_fingerprint)
    assert sig.parameters["fp_samples"].default == 129
    assert sig.parameters["n_bands"].default == 8
    dsig = inspect.signature(dhash_bands)
    assert dsig.parameters["grid"].default == 16
    assert dsig.parameters["n_bands"].default == 8


def test_audio_fingerprint_validates():
    with pytest.raises(ValueError, match="divide"):
        audio_fingerprint(None, fp_samples=57, n_bands=5)
    with pytest.raises(ValueError, match="fp_samples"):
        audio_fingerprint(None, fp_samples=2)


# ── banded_hamming_pairs: pigeonhole recall is EXACT ────────────────────


def test_banded_hamming_equals_brute_force(spark):
    rng = np.random.default_rng(12)
    fps = rng.integers(0, 1 << 16, size=(30, 4))
    # plant a couple of near pairs
    fps[10] = fps[3] ^ np.array([1, 2, 0, 0])  # hamming 2
    fps[20] = fps[7]  # hamming 0
    df = spark.createDataFrame(
        [(f"id{i:02d}", *[int(v) for v in row]) for i, row in enumerate(fps)],
        "id string, b0 int, b1 int, b2 int, b3 int",
    )
    got = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in banded_hamming_pairs(
            df, "id", ["b0", "b1", "b2", "b3"], band_bits=16,
            max_hamming=13, probe_bits=4, allow_narrow_probes=True,
        ).collect()
    }
    want = {}
    for i in range(30):
        for j in range(i + 1, 30):
            d = sum(int(bin(int(a) ^ int(b)).count("1")) for a, b in zip(fps[i], fps[j]))
            if d <= 13:
                want[(f"id{i:02d}", f"id{j:02d}")] = d
    assert got == want
    assert got[("id03", "id10")] == 2
    assert got[("id07", "id20")] == 0


def test_banded_hamming_validates():
    with pytest.raises(ValueError, match="pigeonhole|guarantee"):
        banded_hamming_pairs(None, "id", ["b0"], band_bits=16, max_hamming=13,
                             allow_narrow_probes=True, probe_bits=4)
    with pytest.raises(ValueError, match="divide"):
        banded_hamming_pairs(None, "id", ["b0"], band_bits=14, max_hamming=2,
                             probe_bits=4, allow_narrow_probes=True)
    with pytest.raises(ValueError, match="band column"):
        banded_hamming_pairs(None, "id", [], band_bits=16, max_hamming=2)


def test_banded_hamming_rejects_narrow_probes_without_opt_in():
    """The r13 scale guard (VERDICT r12 #1): a probe narrower than 8
    bits has at most 256 distinct values, so the candidate equi-join
    degenerates to all-pairs at corpus scale — rejected unless the
    caller opts in for a known-small corpus."""
    with pytest.raises(ValueError, match="probe values|all-pairs"):
        banded_hamming_pairs(
            None, "id", ["b0", "b1", "b2", "b3"], band_bits=16,
            max_hamming=13, probe_bits=4,
        )


# ── planted-re-encode recall on the percep fixtures ─────────────────────


def test_image_near_dup_recall_on_planted_reencodes(spark):
    ns = range(8)
    decoded = _decoded_imgs(spark, ns)
    variants = resize_image(
        decoded, out_w=128, out_h=96, id_col="source", id_type="string"
    ).withColumn("source", F.concat(F.col("source"), F.lit("_r")))
    fp = dhash_bands(
        decoded.unionByName(variants), id_col="source", id_type="string"
    )
    pairs = banded_hamming_pairs(
        fp, "source", [f"b{j}" for j in range(8)], band_bits=32,
        max_hamming=15, probe_bits=16,
    ).collect()
    got = {(r["id_a"], r["id_b"]) for r in pairs}
    assert got == {(f"src{n}", f"src{n}_r") for n in ns}


def test_audio_near_dup_recall_on_planted_resamples(spark):
    ns = range(8)
    decoded = _decoded_waves(spark, ns)
    variants = resample_audio(
        decoded, out_len=12007, id_col="source", id_type="string"
    ).withColumn("source", F.concat(F.col("source"), F.lit("_r")))
    fp = audio_fingerprint(
        decoded.unionByName(variants), fp_samples=129, n_bands=8,
        id_col="source", id_type="string",
    )
    pairs = banded_hamming_pairs(
        fp, "source", [f"b{j}" for j in range(8)], band_bits=16,
        max_hamming=7, probe_bits=16,
    ).collect()
    got = {(r["id_a"], r["id_b"]) for r in pairs}
    assert got == {(f"src{n}", f"src{n}_r") for n in ns}
    # the planted pairs are NEAR, not exact: at least one has hamming > 0
    assert any(r["hamming"] > 0 for r in pairs)


# ── label propagation ───────────────────────────────────────────────────


def test_label_propagation_two_cliques(spark):
    # two triangles {a,b,c} and {x,y,z} joined by one bridge edge c-x
    und = [
        ("a", "b"), ("b", "c"), ("a", "c"),
        ("x", "y"), ("y", "z"), ("x", "z"),
        ("c", "x"),
    ]
    edges = spark.createDataFrame(
        und + [(d, s) for s, d in und], "src string, dst string"
    )
    got = {
        r["node"]: r["community"]
        for r in label_propagation(edges, n_iters=3).collect()
    }
    # triangle members converge to the min label of their clique
    assert got["a"] == got["b"] == got["c"] == "a"
    assert got["y"] == got["z"]
    with pytest.raises(ValueError, match="n_iters"):
        label_propagation(edges, n_iters=0)


def test_label_propagation_deterministic_tie_break(spark):
    # node m has one neighbor in each camp: tie broken to the SMALLER label
    und = [("m", "a"), ("m", "b")]
    edges = spark.createDataFrame(
        und + [(d, s) for s, d in und], "src string, dst string"
    )
    got = {
        r["node"]: r["community"]
        for r in label_propagation(edges, n_iters=1).collect()
    }
    assert got["m"] == "a"


# ── mixed-merge rollup + shared scrub tail ──────────────────────────────


def test_rollup_merge_mixed_min_max_sum(spark):
    existing = spark.createDataFrame(
        [("k1", 2, 10, 5), ("k2", 1, 7, 7)], "k string, n long, lo long, hi long"
    )
    batch = spark.createDataFrame(
        [("k1", 3, 4, 9), ("k3", 1, 1, 1)], "k string, n long, lo long, hi long"
    )
    got = {
        r["k"]: (r["n"], r["lo"], r["hi"])
        for r in rollup_merge_mixed(
            existing, batch, ["k"], {"n": "sum", "lo": "min", "hi": "max"}
        ).collect()
    }
    assert got == {"k1": (5, 4, 9), "k2": (1, 7, 7), "k3": (1, 1, 1)}
    with pytest.raises(ValueError, match="merge fns"):
        rollup_merge_mixed(existing, batch, ["k"], {"n": "avg"})


def test_scrub_with_keepers_equals_scrub_spans(spark):
    docs = spark.createDataFrame(
        [
            (1, "a b c d e f g h i j"),
            (2, "x a b c d e f g h i j y"),
            (3, "p q r s t u v w a a"),
        ],
        "doc_id bigint, text string",
    )
    k = 8
    sh = token_shingles(docs, "doc_id", "text", k=k)
    dup = (
        sh.groupBy("_sh")
        .agg(
            F.count_distinct("doc_id").alias("_nd"),
            F.min(
                F.struct(F.col("doc_id").alias("d"), F.col("_off").alias("o"))
            ).alias("_keep"),
        )
        .where(F.col("_nd") >= 2)
        .select("_sh", "_keep")
    )
    via_keepers = {
        r["doc_id"]: (r["n_tokens"], r["n_removed"], r["clean_text"])
        for r in scrub_with_keepers(docs, "doc_id", "text", k, dup).collect()
    }
    direct = {
        r["doc_id"]: (r["n_tokens"], r["n_removed"], r["clean_text"])
        for r in scrub_spans(docs, "doc_id", "text", k=k, min_docs=2).collect()
    }
    assert via_keepers == direct
    # doc 1 is the keeper (smallest (doc, off)); doc 2 loses the shared run
    assert direct[1][1] == 0
    assert direct[2][1] > 0


def test_rollup_apply_batch_mixed_replay_guard(spark, tmp_path):
    from hdfs_stream_processing_spark.sources.io import read_table_version
    from hdfs_stream_processing_spark.streaming.pipeline import (
        rollup_apply_batch_mixed,
    )

    tdir = str(tmp_path / "rollup")
    spec = {"nd": "sum", "keepkey": "min"}
    b0 = spark.createDataFrame(
        [("w1", 1, 100), ("w2", 2, 205)], "k string, nd long, keepkey long"
    )
    b1 = spark.createDataFrame(
        [("w1", 2, 50)], "k string, nd long, keepkey long"
    )
    assert rollup_apply_batch_mixed(b0, tdir, ["k"], spec, batch_id=0)
    assert rollup_apply_batch_mixed(b1, tdir, ["k"], spec, batch_id=1)
    # replay of batch 1 must be skipped, not re-merged
    assert not rollup_apply_batch_mixed(b1, tdir, ["k"], spec, batch_id=1)
    got = {
        r["k"]: (r["nd"], r["keepkey"])
        for r in read_table_version(spark, tdir).drop("_batch").collect()
    }
    assert got == {"w1": (3, 50), "w2": (2, 205)}


def test_stream_communities_maintained_edges_equal_one_shot(spark, tmp_path):
    """r13 (VERDICT r12 #5): LPA read off a replay-guarded maintained
    edge table equals LPA over the edges directly — and a replayed
    micro-batch is skipped, not re-merged."""
    from hdfs_stream_processing_spark.sources.io import read_table_version
    from hdfs_stream_processing_spark.streaming.pipeline import rollup_apply_batch

    und = [
        ("a", "b"), ("b", "c"), ("a", "c"),
        ("x", "y"), ("y", "z"), ("x", "z"),
    ]
    tdir = str(tmp_path / "edges")
    b0 = spark.createDataFrame(und[:3], "s string, d string").withColumn(
        "one", F.lit(1).cast("long")
    )
    b1 = spark.createDataFrame(und[3:], "s string, d string").withColumn(
        "one", F.lit(1).cast("long")
    )
    assert rollup_apply_batch(b0, tdir, ["s", "d"], ["one"], batch_id=0)
    assert rollup_apply_batch(b1, tdir, ["s", "d"], ["one"], batch_id=1)
    assert not rollup_apply_batch(b1, tdir, ["s", "d"], ["one"], batch_id=1)
    pairs = read_table_version(spark, tdir).select("s", "d")
    edges = pairs.unionByName(
        pairs.select(F.col("d").alias("s"), F.col("s").alias("d"))
    )
    direct = spark.createDataFrame(
        und + [(d, s) for s, d in und], "src string, dst string"
    )
    got = {
        r["node"]: r["community"]
        for r in label_propagation(edges, "s", "d", n_iters=2).collect()
    }
    want = {
        r["node"]: r["community"]
        for r in label_propagation(direct, n_iters=2).collect()
    }
    assert got == want and got["a"] == got["b"] == got["c"]


def test_image_near_dup_finds_bmp_png_twins(spark):
    """r13 (VERDICT r12 #3): a 128×96 re-encode saved as compressed
    PNG must pair with its BMP original through the full production
    path — magic-byte dispatch decode → 256-bit dHash → 16-bit-probe
    banded match — even though every payload byte (and the container
    format itself) differs."""
    from hdfs_stream_processing_spark.operators.multimodal import encode_png

    ns = range(6)
    rows = []
    for n in ns:
        arr = _tex_image(n)
        h, w = arr.shape[:2]
        xs = (np.arange(128) * w) // 128
        ys = (np.arange(96) * h) // 96
        rows.append((f"src{n}", bytearray(encode_bmp(arr))))
        rows.append((f"src{n}_r", bytearray(encode_png(arr[np.ix_(ys, xs)]))))
    df = spark.createDataFrame(rows, "source string, payload binary")
    fp = dhash_bands(
        decode_image(df, id_col="source", payload_col="payload", id_type="string"),
        id_col="source", id_type="string",
    )
    pairs = banded_hamming_pairs(
        fp, "source", [f"b{j}" for j in range(8)], band_bits=32,
        max_hamming=15, probe_bits=16,
    ).collect()
    assert {(r["id_a"], r["id_b"]) for r in pairs} == {
        (f"src{n}", f"src{n}_r") for n in ns
    }


def test_rollup_mixed_struct_min_keeper_survives_wide_offsets(spark, tmp_path):
    """r13 (VERDICT r12 #4): the streaming scrub keeper is merged as an
    UNENCODED struct(d, o) min.  With the old doc_id*1e6 + offset
    encoding, doc 1 at offset 1,500,000 would encode to 2,500,000 and
    LOSE to doc 2 at offset 0 (2,000,000) — the struct min must pick
    (1, 1500000), proving no offset-width invariant is load-bearing."""
    from hdfs_stream_processing_spark.sources.io import read_table_version
    from hdfs_stream_processing_spark.streaming.pipeline import (
        rollup_apply_batch_mixed,
    )

    tdir = str(tmp_path / "keepers")
    spec = {"nd": "sum", "_keep": "min"}
    schema = "k string, nd long, _keep struct<d: bigint, o: int>"
    b0 = spark.createDataFrame([("w1", 1, (2, 0))], schema)
    b1 = spark.createDataFrame([("w1", 1, (1, 1_500_000))], schema)
    assert rollup_apply_batch_mixed(b0, tdir, ["k"], spec, batch_id=0)
    assert rollup_apply_batch_mixed(b1, tdir, ["k"], spec, batch_id=1)
    rows = read_table_version(spark, tdir).drop("_batch").collect()
    assert len(rows) == 1
    assert rows[0]["nd"] == 2
    assert (rows[0]["_keep"]["d"], rows[0]["_keep"]["o"]) == (1, 1_500_000)


def test_dedup_keep_transitive_chain(spark):
    """A ~ B ~ C with A !~ C must still cluster {A, B, C} and keep only
    A — the pairs → components → representatives chain, not a
    pair-local keep rule (and exactly what the recursive-closure oracle
    computes)."""
    from hdfs_stream_processing_spark.operators.graph import (
        cluster_representatives,
        connected_components,
    )

    # fingerprints: B flips bits 0-9 of A; C flips bits 0-19 of A
    # → hamming(A,B)=10, hamming(B,C)=10, hamming(A,C)=20 > t=13
    a = [0, 0, 0, 0]
    b = [(1 << 10) - 1, 0, 0, 0]          # bits 0..9
    c = [0xFFFF, (1 << 4) - 1, 0, 0]      # bits 0..19
    d = [0x5A5A, 0x5A5A, 0x5A5A, 0x5A5A]  # 32 bits from A, >= 14 from B/C
    df = spark.createDataFrame(
        [("A", *a), ("B", *b), ("C", *c), ("D", *d)],
        "sid string, b0 int, b1 int, b2 int, b3 int",
    )
    pairs = banded_hamming_pairs(
        df, "sid", ["b0", "b1", "b2", "b3"], band_bits=16,
        max_hamming=13, probe_bits=4, allow_narrow_probes=True,
    )
    got_pairs = {(r["id_a"], r["id_b"]) for r in pairs.collect()}
    assert got_pairs == {("A", "B"), ("B", "C")}
    comps = connected_components(pairs, "id_a", "id_b")
    kept = {r["sid"] for r in cluster_representatives(df, comps, "sid").collect()}
    assert kept == {"A", "D"}
