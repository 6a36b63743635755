"""Orthogonal Procrustes alignment between two paired embedding
spaces — the embedding-migration diagnostic.

When a corpus is re-embedded (new model version, quantization, a
dimensionality post-process), the question before swapping indexes is
"is the new space the old space up to rotation, and how much real
geometric change is left after the best rotation?" Orthogonal
Procrustes answers it in closed form: R* = argmin_{R orthogonal}
||A_c R - B_c||_F = U Vᵀ from the SVD of A_cᵀB_c (Schönemann 1966).

Scale shape (the x97 covariance-trick pattern): ONE mapInPandas pass
accumulates per-partition (n, Σa, Σb, AᵀB, Σ|a|², Σ|b|²) — d=64 so
each partial is d² doubles; the driver combines #partitions partials
(the only collect, bounded by partition count, never rows) and runs
the d×d SVD locally. The post-alignment residual needs NO second data
pass: with centered cross-gram M_c and the centered square norms,
||A_c R - B_c||²_F = Σ|a_c|² + Σ|b_c|² - 2·tr(RᵀM_c).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame


@dataclass
class ProcrustesResult:
    n: int
    rotation: list[list[float]]  # R, (d x d), maps A-space -> B-space
    residual_rel: float  # ||A_c R - B_c||_F^2 / ||B_c||_F^2
    trace_alignment: float  # tr(R^T M_c) / sqrt(SSa * SSb), in [0, 1]


def procrustes_align(
    pairs: DataFrame, a_col: str = "a", b_col: str = "b"
) -> ProcrustesResult:
    """Fit the orthogonal alignment A_c @ R ~= B_c over paired rows.

    ``pairs`` holds one row per item with two equal-length
    array<float/double> columns. Rows fan out across executors; the
    driver sees only d-sized partials.
    """
    import numpy as np

    def partials(batches):
        # helpers inside the closure (foreign-cwd pickling rule)
        import numpy as np
        import pandas as pd

        n, sa, sb, m, qa, qb = 0, None, None, None, 0.0, 0.0
        for pdf in batches:
            if not len(pdf):
                continue
            a = np.stack(pdf[a_col].to_numpy()).astype(np.float64)
            b = np.stack(pdf[b_col].to_numpy()).astype(np.float64)
            n += a.shape[0]
            sa = a.sum(0) if sa is None else sa + a.sum(0)
            sb = b.sum(0) if sb is None else sb + b.sum(0)
            m = a.T @ b if m is None else m + a.T @ b
            qa += float((a * a).sum())
            qb += float((b * b).sum())
        if n:
            yield pd.DataFrame(
                {
                    "n": [n],
                    "sa": [sa.tolist()],
                    "sb": [sb.tolist()],
                    "m": [m.ravel().tolist()],
                    "qa": [qa],
                    "qb": [qb],
                }
            )

    parts = (
        pairs.select(a_col, b_col)
        .mapInPandas(
            partials,
            "n long, sa array<double>, sb array<double>, "
            "m array<double>, qa double, qb double",
        )
        .collect()  # bounded: <= one row per partition
    )
    if not parts:
        return ProcrustesResult(0, [], 0.0, 0.0)
    n = sum(p["n"] for p in parts)
    sa = np.sum([np.array(p["sa"]) for p in parts], axis=0)
    sb = np.sum([np.array(p["sb"]) for p in parts], axis=0)
    d = len(sa)
    m = np.sum(
        [np.array(p["m"]).reshape(d, d) for p in parts], axis=0
    )
    qa = sum(p["qa"] for p in parts)
    qb = sum(p["qb"] for p in parts)
    mu_a, mu_b = sa / n, sb / n
    m_c = m - n * np.outer(mu_a, mu_b)
    ssa = qa - n * float(mu_a @ mu_a)
    ssb = qb - n * float(mu_b @ mu_b)
    u, _s, vt = np.linalg.svd(m_c)
    r = u @ vt
    tr = float(np.trace(r.T @ m_c))
    resid = ssa + ssb - 2.0 * tr
    return ProcrustesResult(
        n=int(n),
        rotation=r.tolist(),
        residual_rel=float(resid / ssb) if ssb > 0 else 0.0,
        trace_alignment=(
            float(tr / np.sqrt(ssa * ssb)) if ssa > 0 and ssb > 0 else 0.0
        ),
    )
