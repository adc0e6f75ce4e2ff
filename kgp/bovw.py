"""Bag-of-visual-words image features (PoiFeatureExtractor port).

Reference: palladian-image-processing
``features/PoiFeatureExtractor.java:73-160`` — build a visual
vocabulary by clustering local descriptors from a training image set
(``buildVocabulary`` → ``CommonsKMeansClusterer``, the reference also
ships a Spark variant ``clustering/SparkKMeansClusterer.java``), then
represent each image as the histogram of its descriptors' nearest
centroids (``extract`` :136-160 — EuclideanDistance, strict ``<`` so
the FIRST centroid wins ties).

Descriptor strategy: the reference plugs third-party SIFT/SURF/MOPS
extractors (``kaggle/restaurants/features/descriptors/*`` wrap mpicbg
and BoofCV — external-library wrappers, excluded per the repo policy).
The substitute here is a deterministic GRID-PATCH descriptor built
from the reference's own cell-cutting arithmetic
(``LocalFeatureExtractor.java:31-41`` / ``GridSimilarityExtractor``:
``cellWidth = width / divisions``, x-major cell order, remainder
pixels ignored): each grid cell yields one descriptor — the vector of
its four quadrant luminosity SUMS (luminosity per
``features/color/Luminosity.java``: ``(int)(0.21 R + 0.72 G +
0.07 B)``). Every component is an exact integer, which is what lets a
DuckDB oracle recompute vocabulary, assignment and histograms
bit-for-bit from the closed-form synth pixels.

Scale shape (100 TB posture):
  * descriptor extraction: ONE column-pruned mapInPandas pass over
    (media_id, content) — image bytes never shuffle;
  * vocabulary: pyspark.ml KMeans over the descriptor DataFrame (the
    reference's own Spark path), or the deterministic 'seed'
    quantizer (training-slice descriptors AS the vocabulary — same
    trick as kgp.similarity's IVF seed quantizer) for oracle-checked
    runs;
  * histograms: centroids broadcast into the SAME Arrow pass that
    extracts descriptors — assignment is a small numpy matmul per
    image, and only (media_id, word, cnt) rows ever shuffle.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from kgp.multimodal import decode_image


def _luminosity(img: np.ndarray) -> np.ndarray:
    """(h, w) int gray plane: (int)(0.21 R + 0.72 G + 0.07 B) —
    features/color/Luminosity.java (trunc, not round)."""
    f = img.astype(np.float64)
    return np.trunc(0.21 * f[:, :, 0] + 0.72 * f[:, :, 1]
                    + 0.07 * f[:, :, 2]).astype(np.int64)


def grid_patch_descriptors(img: np.ndarray,
                           divisions: int = 2) -> list[tuple[int, np.ndarray]]:
    """[(cell_idx, desc[4])] — one descriptor per grid cell: the
    quadrant luminosity sums, quadrants cut by the same
    integer-division grid arithmetic as the cells (remainders
    ignored, exactly like BufferedImage.getSubimage grids in the
    reference). Images too small for a quadrant (cell side < 2) yield
    no descriptors. Cell order is x-major (cells[xIdx * divisions +
    yIdx], LocalFeatureExtractor.java:38)."""
    h, w = img.shape[:2]
    cw, ch = w // divisions, h // divisions
    if cw < 2 or ch < 2:
        return []
    lum = _luminosity(img)
    qw, qh = cw // 2, ch // 2
    out = []
    for xi in range(divisions):
        for yi in range(divisions):
            cell = lum[yi * ch:yi * ch + ch, xi * cw:xi * cw + cw]
            desc = np.array([
                cell[qy * qh:(qy + 1) * qh,
                     qx * qw:(qx + 1) * qw].sum()
                for qx in range(2) for qy in range(2)], dtype=np.int64)
            out.append((xi * divisions + yi, desc))
    return out


DESC_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType()),
    T.StructField("cell", T.IntegerType()),
    T.StructField("d0", T.LongType()),
    T.StructField("d1", T.LongType()),
    T.StructField("d2", T.LongType()),
    T.StructField("d3", T.LongType()),
])


def image_descriptors(media: DataFrame,
                      divisions: int = 2) -> DataFrame:
    """Image rows → (media_id, cell, d0..d3): one column-pruned
    mapInPandas pass, decode + grid-patch descriptors."""
    src = media.where("kind = 'image'").select("media_id", "content")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                img = decode_image(bytes(content))
                for cell, d in grid_patch_descriptors(img, divisions):
                    rows.append((int(mid), cell,
                                 int(d[0]), int(d[1]),
                                 int(d[2]), int(d[3])))
            yield pd.DataFrame(rows, columns=[
                "media_id", "cell", "d0", "d1", "d2", "d3"])

    return src.mapInPandas(run, DESC_SCHEMA)


def build_vocabulary(descriptors: DataFrame, k: int = 200,
                     seed: int = 42) -> np.ndarray:
    """PoiFeatureExtractor.buildVocabulary with the Spark-native
    clusterer (the reference's own SparkKMeansClusterer path;
    CommonsKMeansClusterer is the single-node analog): pyspark.ml
    KMeans over the descriptor DataFrame → (k, 4) float centroids.
    Result is model-sized — the only thing collected."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    feats = descriptors.select(array_to_vector(F.array(
        F.col("d0").cast("double"), F.col("d1").cast("double"),
        F.col("d2").cast("double"), F.col("d3").cast("double")))
        .alias("features"))
    km = KMeans(k=k, seed=seed, featuresCol="features")
    model = km.fit(feats)
    return np.array([np.asarray(c) for c in model.clusterCenters()])


def seed_vocabulary(descriptors: DataFrame,
                    seed_mod: int = 30) -> np.ndarray:
    """Deterministic vocabulary for oracle-checked runs: the
    descriptors of the training slice (media_id %% seed_mod == 0)
    ordered by (media_id, cell) ARE the centroids — the same seed
    quantizer pattern kgp.similarity uses for IVF. Integer-exact, so
    nearest-centroid assignment has a closed SQL form."""
    rows = (descriptors.where(F.col("media_id") % seed_mod == 0)
            .orderBy("media_id", "cell")
            .select("d0", "d1", "d2", "d3").collect())
    if not rows:
        raise ValueError(f"no vocabulary images at %{seed_mod}==0")
    return np.array([[r["d0"], r["d1"], r["d2"], r["d3"]]
                     for r in rows], dtype=np.int64)


BOW_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType()),
    T.StructField("word", T.IntegerType()),
    T.StructField("cnt", T.LongType()),
])


def bow_histograms(media: DataFrame, centroids: np.ndarray,
                   divisions: int = 2) -> DataFrame:
    """PoiFeatureExtractor.extract :136-160 distributed: per image,
    assign each descriptor to its nearest centroid (Euclidean, strict
    < — the FIRST centroid wins ties, reference loop order) and emit
    the non-zero histogram rows (media_id, word, cnt). Centroids ride
    the UDF closure (vocabulary-sized); ONE Arrow pass, no
    descriptor shuffle."""
    src = media.where("kind = 'image'").select("media_id", "content")
    cents = np.asarray(centroids, dtype=np.float64)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                img = decode_image(bytes(content))
                descs = grid_patch_descriptors(img, divisions)
                if not descs:
                    continue
                dmat = np.stack([d for _, d in descs]).astype(np.float64)
                # (n_desc, k) squared distances; argmin = first min
                dist = ((dmat[:, None, :] - cents[None, :, :]) ** 2
                        ).sum(axis=2)
                words = dist.argmin(axis=1)
                uniq, cnt = np.unique(words, return_counts=True)
                for wd, c in zip(uniq, cnt):
                    rows.append((int(mid), int(wd), int(c)))
            yield pd.DataFrame(rows, columns=["media_id", "word", "cnt"])

    return src.mapInPandas(run, BOW_SCHEMA)
