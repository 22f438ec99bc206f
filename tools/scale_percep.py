"""Source-scaled scale probe for the perceptual near-dup family
(r13, VERDICT r12 #2).

The registry fixture is SOURCE-bound (20 sources at every sf), so the
driver's document-copy sf1 probe cannot exercise the perceptual
queries.  This probe synthesizes N sources directly — each staged as a
BMP original plus a PNG 128×96 re-encode (images) / a planted-resample
WAV twin (audio) — and measures, for each corpus size:

  * wall time of the full production pipeline (decode → fingerprint →
    banded match),
  * CANDIDATE volume (raw probe-band collision rows — the join work),
  * matched pair count (the answer),

for BOTH the r13 16-bit-probe parameterization and the r12 4-bit one
(``allow_narrow_probes=True``), because candidate volume is exactly the
measurement that exposes the narrow-probe quadratic blow-up the plan
audit cannot see (the degenerate join is still an equi-join).

Usage: python tools/scale_percep.py [N ...]   (default 20 200 2000)
Prints one JSON line per (modality, N, probe_bits).
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np  # noqa: E402


def _session():
    from pyspark.sql import SparkSession

    return (
        SparkSession.builder.master("local[32]")
        .appName("scale-percep")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.adaptive.enabled", "true")
        .getOrCreate()
    )


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


def _image_fp(spark, n_sources: int):
    from hdfs_stream_processing_spark.operators.multimodal import (
        decode_image,
        dhash_bands,
        encode_bmp,
        encode_png,
    )

    rows = []
    for n in range(n_sources):
        arr = _tex_image(n)
        h, w = arr.shape[:2]
        xs = (np.arange(128) * w) // 128
        ys = (np.arange(96) * h) // 96
        rows.append((f"src{n:05d}", bytearray(encode_bmp(arr))))
        rows.append((f"src{n:05d}_r", bytearray(encode_png(arr[np.ix_(ys, xs)]))))
    df = spark.createDataFrame(rows, "source string, payload binary").repartition(32)
    fp = dhash_bands(
        decode_image(df, id_col="source", payload_col="payload", id_type="string"),
        id_col="source",
        id_type="string",
    )
    return fp, [f"b{j}" for j in range(8)], 32, 15


def _audio_fp(spark, n_sources: int):
    from hdfs_stream_processing_spark.operators.multimodal import (
        audio_fingerprint,
        decode_audio,
        encode_wav,
    )

    rows = []
    for n in range(n_sources):
        s = _block_wave(n)
        var = s[(np.arange(12007) * len(s)) // 12007]
        rows.append((f"src{n:05d}", bytearray(encode_wav(s, 8000))))
        rows.append((f"src{n:05d}_r", bytearray(encode_wav(var, 8000))))
    df = spark.createDataFrame(rows, "source string, payload binary").repartition(32)
    fp = audio_fingerprint(
        decode_audio(df, id_col="source", payload_col="payload", id_type="string"),
        fp_samples=129,
        n_bands=8,
        id_col="source",
        id_type="string",
    )
    return fp, [f"b{j}" for j in range(8)], 16, 7


def probe(spark, modality: str, n_sources: int) -> list[dict]:
    from hdfs_stream_processing_spark.operators.dedup import (
        banded_hamming_pairs,
        hamming_candidates,
    )

    build = _image_fp if modality == "image" else _audio_fp
    fp, band_cols, band_bits, t = build(spark, n_sources)
    fp = fp.persist()
    fp.count()
    out = []
    # (probe_bits, probe_blocks): the r13 single-block 16-bit default,
    # the r14 combinatorial 2-block/32-bit-key opt-in (radius drops by
    # one — Manku et al. 2007, VERDICT r13 #4), and the retired r12
    # 4-bit parameterization whose quadratic blow-up this probe exists
    # to expose.
    for probe_bits, probe_blocks in ((16, 1), (16, 2), (4, 1)):
        radius = t - (probe_blocks - 1)
        t0 = time.time()
        cand = hamming_candidates(
            fp, "source", band_cols, band_bits, probe_bits, probe_blocks
        )
        n_cand = cand.count()
        cand_sec = time.time() - t0
        # distinct candidate PAIRS: raw rows scale with the per-true-pair
        # probe multiplicity (×P single-block, ×C(P,2) combinatorial), so
        # the number that isolates the RANDOM-collision floor — the 10⁹-
        # regime cost driver — is distinct pairs; false = distinct − true.
        n_cand_distinct = cand.distinct().count()
        t0 = time.time()
        n_pairs = banded_hamming_pairs(
            fp, "source", band_cols, band_bits, max_hamming=radius,
            probe_bits=probe_bits, allow_narrow_probes=(probe_bits < 8),
            probe_blocks=probe_blocks,
        ).count()
        match_sec = time.time() - t0
        rec = {
            "modality": modality,
            "n_sources": n_sources,
            "n_items": 2 * n_sources,
            "probe_bits": probe_bits,
            "probe_blocks": probe_blocks,
            "radius": radius,
            "candidates": n_cand,
            "cand_distinct": n_cand_distinct,
            "pairs": n_pairs,
            "cand_sec": round(cand_sec, 2),
            "match_sec": round(match_sec, 2),
        }
        print(json.dumps(rec), flush=True)
        out.append(rec)
    fp.unpersist()
    return out


def main() -> None:
    sizes = [int(a) for a in sys.argv[1:]] or [20, 200, 2000]
    spark = _session()
    spark.sparkContext.setLogLevel("ERROR")
    for modality in ("image", "audio"):
        for n in sizes:
            probe(spark, modality, n)


if __name__ == "__main__":
    main()
