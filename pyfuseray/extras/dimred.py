"""Dimensionality reduction: fit-on-sample PCA + broadcast transform.

The reference reduces embeddings with UMAP/PCA before indexing
(reference ``app/MultiDim.py:226-246``, fit on the full matrix in one
process). The scale re-expression is the classic two-phase shape:

- **fit**: a seeded ``ds.random_sample`` draws a bounded sample to the
  driver; PCA components come from one numpy SVD over the centered
  sample (deterministic sign convention).
- **transform**: mean + components broadcast ONCE via ``ray.put``; one
  ``map_batches`` pass projects every vector — the corpus itself never
  leaves the workers.

Partitioning assumption: the sample (sample_fraction x corpus, capped
by ``max_sample``) and the (dim x k) component matrix fit on the
driver / in one broadcast. UMAP itself needs a neighbour graph and is
not portable to this sandbox (no umap-learn); PCA is the deterministic
family member and keeps the same pipeline role.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data as rd

from pyfuseray.extras.vecs import as_matrix


class PCAModel:
    def __init__(self, mean: np.ndarray, components: np.ndarray):
        self.mean = mean              # (dim,)
        self.components = components  # (dim, k)

    @property
    def out_dim(self) -> int:
        return self.components.shape[1]


def fit_pca(
    embeddings: rd.Dataset,
    n_components: int,
    *,
    sample_fraction: float = 0.2,
    max_sample: int = 100_000,
    seed: int = 17,
    vec_col: str = "embedding",
) -> PCAModel:
    """Fit PCA on a seeded bounded sample (SVD of the centered sample).

    Deterministic: seeded sample, fixed sign convention (largest-|.|
    component coordinate made positive)."""
    sample = embeddings.random_sample(min(1.0, sample_fraction), seed=seed)
    df = sample.select_columns([vec_col]).limit(max_sample).to_pandas()
    if len(df) < n_components + 1:
        df = embeddings.select_columns([vec_col]).limit(max_sample).to_pandas()
    x = np.asarray(df[vec_col].tolist(), dtype=np.float64)
    mean = x.mean(axis=0)
    xc = x - mean
    # economy SVD: components = top right-singular vectors
    _, _, vt = np.linalg.svd(xc, full_matrices=False)
    comps = vt[:n_components].T  # (dim, k)
    # sign convention: flip each component so its largest-|.| entry is >= 0
    flip = np.sign(comps[np.abs(comps).argmax(axis=0), np.arange(comps.shape[1])])
    flip[flip == 0] = 1.0
    return PCAModel(mean, comps * flip)


def pca_transform(
    embeddings: rd.Dataset,
    model: PCAModel,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    out_col: str = "reduced",
) -> rd.Dataset:
    """(id, vec) -> (id, reduced): one broadcast, one map_batches pass."""
    m_ref = ray.put((model.mean, model.components))

    def project(batch: pa.Table) -> pa.Table:
        mean, comps = ray.get(m_ref)
        vecs = as_matrix(batch.column(vec_col), dtype=np.float64)
        red = (vecs - mean) @ comps
        return pa.table(
            {
                id_col: batch.column(id_col),
                out_col: pa.array(
                    [row.tolist() for row in red], pa.list_(pa.float64())
                ),
            }
        )

    return embeddings.select_columns([id_col, vec_col]).map_batches(
        project, batch_format="pyarrow"
    )
