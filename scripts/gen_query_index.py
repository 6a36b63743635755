"""Regenerate QUERIES.md — the one-screen-per-family index of every
registered query (name, oracle status, tags, first doc sentence).
Generated artifact: rerun after adding operators, don't hand-edit."""

from __future__ import annotations

import re
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from server_spark import registry  # noqa: E402

# r13 rows-only audit (VERDICT r12 item 4): every query WITHOUT a SQL
# oracle carries a re-adjudicated one-line reason here. The generator
# asserts this dict's keys exactly equal the registry's no-oracle set,
# so adding/promoting a query without updating its reason fails the
# regeneration loudly instead of letting QUERIES.md drift. Each entry
# was re-checked against the three r12 promotion techniques
# (recursive-CTE state machines, in-recursion aggregation, plain SQL
# re-expression) — these are the ones where the blocker is a genuine
# engine-side artifact, not SQL inexpressibility of the control flow.
ROWS_ONLY_REASONS = {
    "a9_approx_distinct_owners": (
        "HLL sketch estimate — Spark's HLL++ and DuckDB's HLL are "
        "different sketches; estimates differ by construction"),
    "a17_sketch_distinct_owners": (
        "persisted HLL sketch state (merge algebra) — engine-specific "
        "binary registers, no cross-engine value to compare"),
    "a23_sketch_overlap": (
        "theta-sketch intersection estimate — same sketch-state "
        "reason as a17; overlap error compounds two sketches"),
    "a2d_price_stats_decimal": (
        "Spark decimal division/avg rounds HALF_UP at derived scale "
        "(p+4, s+4); DuckDB promotes decimal avg to DOUBLE — equal "
        "values serialize differently at the hash boundary. r14: "
        "cross-engine VALUE-verified anyway via a declared-scale "
        "value oracle (both sides quantized HALF_UP at the scale-4 "
        "money grid in every local parity pass); only the driver's "
        "raw-hash gate records it rows-only"),
    "x8_minhash_neardup": (
        "xxhash64 signatures — DuckDB has no xxhash64; the md5 twin "
        "x8b hash-verifies the identical banding pipeline"),
    "x9_simhash_fingerprint": (
        "same hash-primitive reason as x8; value-verified twin x9b"),
    "x14_ivf_topk": (
        "trained k-means coarse quantizer (float iteration) — "
        "centroid ulps flip assignments; recall pinned vs x3 instead"),
    "x41b_semantic_dedup_scaled": (
        "trained IVF index (same k-means reason as x14); exactness "
        "pinned by x41's oracle on the unscaled path"),
    "x47_pq_adc_topk": (
        "trained PQ codebooks (k-means per subspace) — same float-"
        "model reason as x14; config-metamorphic tests pin recall"),
    "x49_ivfpq_topk": "IVF + PQ composition — both trained-model reasons",
    "x51_incremental_index_assign": (
        "assigns against the trained IVF centroids (x14 reason)"),
    "x52_ivfpq_refine_topk": (
        "IVFPQ candidates (trained models) + exact refine; refine "
        "layer is exact but candidates are model-dependent"),
    "x97_pca_abtt": (
        "eigendecomposition (numpy LAPACK) — no SQL eigensolver; "
        "variance/orthogonality properties pinned in tests"),
    "x108_embedding_alignment": (
        "orthogonal Procrustes via SVD — same LAPACK reason as x97"),
    "x64_compression_ratio": (
        "bits-per-byte needs zlib inside the engine; DuckDB exposes "
        "no compression function — ranking layer is plain SQL but "
        "its input values are engine-side"),
    "x12_multimodal_meta": (
        "binary container decode in executors — no SQL twin for "
        "byte-level parsing"),
    "x60_media_resize": (
        "pixel decode/re-encode (PNG/BMP/GIF/JPEG codecs) — "
        "engine-side binary, golden-image tests instead"),
    "x61_frame_sample": "binary chunk demux — same codec reason as x60",
    "x120_audio_features": (
        "PCM WAV decode + DSP features — engine-side binary"),
    "x125_image_features": "pixel decode + features — same as x60",
    "x128_image_phash_neardup": (
        "perceptual hash over decoded pixels (DCT) — codec + float "
        "DCT, banding pipeline shape shared with hash-verified x9b"),
    "x129_audio_fingerprint_neardup": (
        "spectral fingerprint over decoded PCM — same reason as x128"),
    "x130_scene_detect": "frame-delta detection over decoded video",
    "x131_keyframe_thumbs": "video decode + thumbnail re-encode",
    "x135_gif_motion": "GIF frame decode (LZW) — engine-side binary",
    "x136_jpeg_blockiness": (
        "JPEG DCT-domain analysis over decoded coefficients — "
        "engine-side codec"),
}


def first_sentence(doc: str) -> str:
    doc = " ".join(doc.split())
    m = re.match(r"(.+?\.)(?:\s|$)", doc)
    return (m.group(1) if m else doc)[:220]


def main() -> None:
    registry.queries()  # force load
    rows_only = {q.name for q in registry.REGISTRY.values()
                 if not q.oracle}
    missing = rows_only - set(ROWS_ONLY_REASONS)
    stale = set(ROWS_ONLY_REASONS) - rows_only
    assert not missing and not stale, (
        f"rows-only audit drift: missing reasons {sorted(missing)}, "
        f"stale entries {sorted(stale)} — update ROWS_ONLY_REASONS"
    )
    lines = [
        "# QUERIES — registered query surface",
        "",
        "Generated by scripts/gen_query_index.py; regenerate, don't edit.",
        '"oracle" = hash-verified against the DuckDB twin on every',
        "parity run; \"rows-only\" = no honest SQL twin (engine-side",
        "model state / hashing / UDF) — covered by pytest instead.",
        "",
        "| Query | Check | Tags | What it does |",
        "|---|---|---|---|",
    ]
    n_oracle = 0
    for q in registry.REGISTRY.values():
        if q.oracle:
            kind = "oracle"
        elif q.value_oracle:
            kind = f"value@{q.value_scale}"
        else:
            kind = "rows-only"
        n_oracle += bool(q.oracle)
        lines.append(
            f"| `{q.name}` | {kind} | {', '.join(q.tags)} | "
            f"{first_sentence(q.doc)} |"
        )
    lines.append("")
    lines.append(
        f"Totals: {len(registry.REGISTRY)} queries — {n_oracle} "
        f"oracle-backed, {len(registry.REGISTRY) - n_oracle} rows-only."
    )
    lines += [
        "",
        "## Rows-only audit",
        "",
        "Why each no-oracle query stays rows-only (re-adjudicated "
        "r13 against the recursive-CTE / in-recursion-aggregation / "
        "plain-re-expression promotion techniques; the generator "
        "asserts this list matches the registry exactly):",
        "",
        "| Query | Why no SQL oracle |",
        "|---|---|",
    ]
    for name in sorted(ROWS_ONLY_REASONS):
        lines.append(f"| `{name}` | {ROWS_ONLY_REASONS[name]} |")
    (REPO / "QUERIES.md").write_text("\n".join(lines) + "\n")
    print(f"wrote QUERIES.md ({len(registry.REGISTRY)} queries)")


if __name__ == "__main__":
    main()
