"""Image feature extractors (palladian-image-processing features/).

Reference semantics:

- ``BoundsFeatureExtractor`` (features/BoundsFeatureExtractor.java):
  width, height, ratio = height/width.
- ColorExtractors (features/color/RGB.java, Luminosity.java,
  HSB.java): channel values; luminosity = (int)(0.21 R + 0.72 G +
  0.07 B); hue/saturation/brightness = (int)(Color.RGBtoHSB * 255)
  (java.awt.Color.RGBtoHSB ported below).
- ``StatisticsFeatureExtractor`` + ``HistogramStats``
  (features/StatisticsFeatureExtractor.java,
  utils/HistogramStats.java): a 256-bin histogram per extractor with
  POPULATION moments (isSample=false): stddev = sqrt(m2), skewness =
  m3/m2^1.5, EXCESS kurtosis = m4/m2^2 - 3, relStdDev = std/mean
  (0 when mean == 0), percentile by the FatStats rule over the
  cumulated histogram.
- ``SymmetryFeatureExtractor``
  (features/SymmetryFeatureExtractor.java:similarity): per
  ColorExtractor, 1 - sqrt(mean((|v1-v2|/255)^2)) between the image
  and its vertical flip (-> symmetry-horizontal), horizontal flip
  (-> symmetry-vertical), both-flip and 180-degree rotation (equal by
  construction; the reference computes both, so do we).

Spark mapping: ONE column-pruned Arrow pass over the binary media
column (numpy vectorized per image, no per-pixel Python); the
deterministic BMP corpus keeps every feature SQL-derivable for the
gate oracle.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame

from kgp.multimodal import decode_bmp

EXTRACTORS = ("red", "green", "blue", "luminosity",
              "hue", "saturation", "brightness")


def rgb_to_hsb(r: np.ndarray, g: np.ndarray,
               b: np.ndarray) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """java.awt.Color.RGBtoHSB vectorized (hue in [0,1))."""
    r = r.astype(np.float64)
    g = g.astype(np.float64)
    b = b.astype(np.float64)
    cmax = np.maximum(np.maximum(r, g), b)
    cmin = np.minimum(np.minimum(r, g), b)
    brightness = cmax / 255.0
    diff = cmax - cmin
    with np.errstate(divide="ignore", invalid="ignore"):
        saturation = np.where(cmax != 0, diff / cmax, 0.0)
        redc = np.where(diff != 0, (cmax - r) / diff, 0.0)
        greenc = np.where(diff != 0, (cmax - g) / diff, 0.0)
        bluec = np.where(diff != 0, (cmax - b) / diff, 0.0)
    hue = np.where(
        r == cmax, bluec - greenc,
        np.where(g == cmax, 2.0 + redc - bluec, 4.0 + greenc - redc))
    hue = hue / 6.0
    hue = np.where(hue < 0, hue + 1.0, hue)
    hue = np.where(saturation == 0, 0.0, hue)
    return hue, saturation, brightness


def extract_values(img: np.ndarray, extractor: str) -> np.ndarray:
    """ColorExtractor.extractValue over an HxWx3 uint8 array ->
    flat int array in [0, 255]."""
    r = img[:, :, 0].ravel()
    g = img[:, :, 1].ravel()
    b = img[:, :, 2].ravel()
    if extractor == "red":
        return r.astype(np.int64)
    if extractor == "green":
        return g.astype(np.int64)
    if extractor == "blue":
        return b.astype(np.int64)
    if extractor == "luminosity":
        return (0.21 * r + 0.72 * g + 0.07 * b).astype(np.int64)
    hue, sat, bright = rgb_to_hsb(r, g, b)
    pick = {"hue": hue, "saturation": sat, "brightness": bright}
    return (pick[extractor] * 255).astype(np.int64)


class HistStats:
    """HistogramStats port over a flat int-valued array."""

    def __init__(self, values: np.ndarray, max_value: int = 256):
        self.hist = np.bincount(values, minlength=max_value) \
            .astype(np.int64)
        self.count = int(self.hist.sum())
        self.idx = np.arange(max_value, dtype=np.float64)

    def _moment(self, k: int) -> float:
        mean = self.mean()
        return float((self.hist * (self.idx - mean) ** k).sum()
                     / self.count)

    def sum(self) -> float:
        return float((self.hist * self.idx).sum())

    def mean(self) -> float:
        return self.sum() / self.count

    def min(self) -> float:
        return float(np.flatnonzero(self.hist)[0])

    def max(self) -> float:
        return float(np.flatnonzero(self.hist)[-1])

    def range(self) -> float:
        return self.max() - self.min()

    def stddev(self) -> float:
        return float(np.sqrt(self._moment(2)))

    def rel_stddev(self) -> float:
        m = self.mean()
        return self.stddev() / m if m != 0 else 0.0

    def variance(self) -> float:
        s = self.stddev()
        return s * s

    def skewness(self) -> float:
        m2 = self._moment(2)
        return self._moment(3) / m2 ** 1.5 if m2 else 0.0

    def kurtosis(self) -> float:
        m2 = self._moment(2)
        return self._moment(4) / m2 ** 2 - 3 if m2 else 0.0

    def percentile(self, p: int) -> float:
        n = p / 100.0 * self.count
        cum = np.cumsum(self.hist)

        def value_at(index: int) -> float:
            return float(np.searchsorted(cum, index + 1))

        if n == int(n):
            return 0.5 * value_at(int(n) - 1) + 0.5 * value_at(int(n))
        return value_at(int(np.ceil(n)) - 1)


def bounds_features(img: np.ndarray) -> dict:
    h, w = img.shape[:2]
    return {"width": w, "height": h, "ratio": h / w}


def statistics_features(img: np.ndarray,
                        extractors=EXTRACTORS) -> dict:
    out = {}
    for ex in extractors:
        s = HistStats(extract_values(img, ex))
        out.update({
            f"{ex}_max": s.max(), f"{ex}_mean": s.mean(),
            f"{ex}_min": s.min(), f"{ex}_range": s.range(),
            f"{ex}_stdDev": s.stddev(),
            f"{ex}_relStdDev": s.rel_stddev(),
            f"{ex}_sum": s.sum(), f"{ex}_count": s.count,
            f"{ex}_skewness": s.skewness(),
            f"{ex}_kurtosis": s.kurtosis(),
        })
        for p in range(10, 100, 10):
            out[f"{ex}_{p}-percentile"] = s.percentile(p)
    return out


def _pair_similarity(a: np.ndarray, b: np.ndarray) -> float:
    """SymmetryFeatureExtractor.similarity with r=2."""
    d = (np.abs(a - b) / 255.0) ** 2
    return 1.0 - float(np.sqrt(d.sum() / d.size))


def symmetry_features(img: np.ndarray,
                      extractors=EXTRACTORS) -> dict:
    flip_v = img[::-1, :, :]       # top-bottom -> symmetry-horizontal
    flip_h = img[:, ::-1, :]       # left-right -> symmetry-vertical
    both = img[::-1, ::-1, :]
    out = {}
    for ex in extractors:
        base = extract_values(img, ex)
        out[f"symmetry-horizontal-{ex}"] = _pair_similarity(
            base, extract_values(flip_v, ex))
        out[f"symmetry-vertical-{ex}"] = _pair_similarity(
            base, extract_values(flip_h, ex))
        sim_both = _pair_similarity(base, extract_values(both, ex))
        out[f"symmetry-both-{ex}"] = sim_both
        out[f"symmetry-180-rotated-{ex}"] = sim_both
    return out


# ------------------------------------------------------------- stage
GATE_SCHEMA = ("media_id long, width int, height int, ratio double, "
               "red_mean double, red_min double, red_max double, "
               "red_sum double, red_p50 double, red_stddev double, "
               "red_skewness double, lum_mean double, "
               "sym_h_red double, sym_v_red double")


def image_features_stage(media: DataFrame) -> DataFrame:
    """media(media_id, kind, content) -> the gate feature subset, one
    column-pruned Arrow pass (floats rounded to 9 decimals so the
    numpy and SQL accumulation orders agree)."""
    src = media.where("kind = 'image'").select("media_id", "content")

    def run(batches):
        import pandas as pd
        for pdf in batches:
            rows = []
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                img = decode_bmp(bytes(content))
                red = HistStats(extract_values(img, "red"))
                lum = HistStats(extract_values(img, "luminosity"))
                sym = symmetry_features(img, extractors=("red",))
                h, w = img.shape[:2]
                rows.append((
                    int(mid), w, h, h / w,
                    red.mean(), red.min(), red.max(), red.sum(),
                    red.percentile(50),
                    round(red.stddev(), 9), round(red.skewness(), 9),
                    round(lum.mean(), 9),
                    round(sym["symmetry-horizontal-red"], 9),
                    round(sym["symmetry-vertical-red"], 9)))
            yield pd.DataFrame(rows, columns=[
                "media_id", "width", "height", "ratio", "red_mean",
                "red_min", "red_max", "red_sum", "red_p50",
                "red_stddev", "red_skewness", "lum_mean",
                "sym_h_red", "sym_v_red"])

    return src.mapInPandas(run, GATE_SCHEMA)
