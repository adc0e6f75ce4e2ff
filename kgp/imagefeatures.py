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

    def median(self) -> float:
        return self.percentile(50)

    def mode(self) -> float:
        """HistogramStats.getMode (:161-171): lowest bin with the
        strictly-highest count; NaN for an empty histogram."""
        best = float("nan")
        max_count = 0
        for i, n in enumerate(self.hist):
            if n > max_count:
                max_count = int(n)
                best = float(i)
        return best


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


# ----------------------------------------------------------- FatStats

class FatStatsF:
    """FatStats twin over float values (FatStats.java:50-199): SAMPLE
    stddev via the reference's Welford loop in INSERTION order,
    percentile by the 1-based FatStats rule, NaN on empty."""

    def __init__(self, values=()):
        self.values: list[float] = [float(v) for v in values]

    def add(self, v: float) -> None:
        self.values.append(float(v))

    def count(self) -> int:
        return len(self.values)

    def sum(self) -> float:
        return float(sum(self.values))

    def mean(self) -> float:
        if not self.values:
            return float("nan")
        return self.sum() / len(self.values)

    def min(self) -> float:
        return min(self.values) if self.values else float("nan")

    def max(self) -> float:
        return max(self.values) if self.values else float("nan")

    def range(self) -> float:
        return self.max() - self.min() if self.values else float("nan")

    def stddev(self) -> float:
        if not self.values:
            return float("nan")
        if len(self.values) == 1:
            return 0.0
        m = s = 0.0
        k = 1
        for v in self.values:
            tmp = m
            m += (v - tmp) / k
            s += (v - tmp) * (v - m)
            k += 1
        return float(np.sqrt(s / (len(self.values) - 1)))

    def percentile(self, p: int) -> float:
        if not self.values:
            return float("nan")
        vals = sorted(self.values)
        n = p / 100.0 * len(vals)
        if n == int(n):
            return 0.5 * vals[int(n) - 1] + 0.5 * vals[int(n)]
        return vals[int(np.ceil(n)) - 1]

    def median(self) -> float:
        return self.percentile(50)


# --------------------------------------------------------- frequency

def _gray_values(img: np.ndarray) -> np.ndarray:
    """ImageHandler.toGrayScale channel value (0.3/0.59/0.11 trunc)."""
    px = img[:, :, :3].astype(np.float64)
    return (0.3 * px[:, :, 0] + 0.59 * px[:, :, 1]
            + 0.11 * px[:, :, 2]).astype(np.int64)


def detect_frequencies(img: np.ndarray) -> FatStatsF:
    """ImageHandler.detectFrequencies (ImageHandler.java:1205-1240):
    per INTERIOR pixel, mean |brightness delta| against the DISTINCT
    gray values of its sampled neighbors — the reference samples
    (i,j+1) twice and never (i+1,j-1), both quirks kept (the HashSet
    dedups the double-add; the missing corner changes the set).
    Brightness of a gray pixel is value/255 (rgbToHsb[2])."""
    g = _gray_values(img)
    h, w = g.shape
    stats = FatStatsF()
    # reference scan: i (x) outer, j (y) inner
    for i in range(1, w - 1):
        for j in range(1, h - 1):
            v0 = g[j, i] / 255.0
            neigh = {g[j - 1, i - 1], g[j - 1, i], g[j + 1, i],
                     g[j, i - 1], g[j, i + 1], g[j + 1, i - 1],
                     g[j + 1, i + 1]}
            total = sum(abs(n / 255.0 - v0) for n in sorted(neigh))
            stats.add(total / len(neigh))
    return stats


def frequency_features(img: np.ndarray) -> dict:
    """FrequencyFeatureExtractor.java:20-30 — mean/median over the
    raw image, plus 'frequency-dct-mean' over the AS-WRITTEN toDct
    image: the DCT call is commented out in the reference
    (:50-52), so toDct reduces to gray = min(blue + 128, 255);
    kept bug-for-bug."""
    raw = detect_frequencies(img)
    blue = img[:, :, 2].astype(np.int64)
    dct = np.minimum(blue + 128, 255)
    dct_img = np.repeat(dct[:, :, None], 3, axis=2).astype(np.uint8)
    return {"frequency-mean": raw.mean(),
            "frequency-median": raw.median(),
            "frequency-dct-mean": detect_frequencies(dct_img).mean()}


# ---------------------------------------------------- grid similarity

def grid_similarity_features(img: np.ndarray,
                             divisions: int = 2) -> dict:
    """GridSimilarityExtractor.java:29-67: split into divisions² cells
    of (w//d, h//d) pixels (right/bottom leftovers dropped), score
    every cell pair with the SymmetryFeatureExtractor similarity over
    LUMINOSITY, aggregate with FatStats (pairs in (i,j) index order,
    x-major cell indexing)."""
    if divisions < 2:
        raise ValueError("divisions must be at least 2")
    h, w = img.shape[:2]
    cw, ch = w // divisions, h // divisions
    cells = []
    for x_idx in range(divisions):
        for y_idx in range(divisions):
            sub = img[y_idx * ch:(y_idx + 1) * ch,
                      x_idx * cw:(x_idx + 1) * cw]
            cells.append(extract_values(sub, "luminosity"))
    stats = FatStatsF()
    for i in range(len(cells)):
        for j in range(i + 1, len(cells)):
            stats.add(_pair_similarity(cells[i], cells[j]))
    name = f"{divisions}x{divisions}-similarity"
    out = {f"{name}_max": stats.max(), f"{name}_mean": stats.mean(),
           f"{name}_min": stats.min(), f"{name}_range": stats.range(),
           f"{name}_stdDev": stats.stddev(),
           f"{name}_sum": stats.sum()}
    for p in range(10, 100, 10):
        out[f"{name}_{p}-percentile"] = stats.percentile(p)
    return out


# ------------------------------------------------------------ edginess

def detect_edges(img: np.ndarray) -> np.ndarray:
    """ImageHandler.detectEdges (ImageHandler.java:1248-1261)
    substitution: the reference runs JAI ErodeDescriptor (5x5
    all-ones kernel == grayscale erosion / local minimum) then
    GradientMagnitudeDescriptor with the Sobel masks. JAI's exact
    border semantics are not reproducible without the library —
    substituted by edge-replicated padding for both steps; kernel
    math (5x5 min, per-channel sqrt(gx²+gy²) clamped to 255) is
    faithful. Documented substitution, pytest-pinned."""
    px = img[:, :, :3].astype(np.int64)
    pad = np.pad(px, ((2, 2), (2, 2), (0, 0)), mode="edge")
    h, w = px.shape[:2]
    windows = np.lib.stride_tricks.sliding_window_view(
        pad, (5, 5), axis=(0, 1))
    eroded = windows.min(axis=(3, 4))
    sx = np.array([[-1, 0, 1], [-2, 0, 2], [-1, 0, 1]], dtype=np.int64)
    sy = sx.T
    epad = np.pad(eroded, ((1, 1), (1, 1), (0, 0)), mode="edge")
    ew = np.lib.stride_tricks.sliding_window_view(
        epad, (3, 3), axis=(0, 1))
    gx = (ew * sx).sum(axis=(3, 4))
    gy = (ew * sy).sum(axis=(3, 4))
    mag = np.sqrt(gx.astype(np.float64) ** 2 + gy ** 2)
    return np.minimum(mag, 255).astype(np.uint8)


def edginess_features(img: np.ndarray) -> dict:
    """EdginessFeatureExtractor.java:20-55: HistogramStats over the
    brightness channel ((int)(rgbToHsb[2]*255) == the max channel) of
    the edge image."""
    edges = detect_edges(img)
    s = HistStats(extract_values(edges, "brightness"))
    out = {"edginess-max": s.max(), "edginess-min": s.min(),
           "edginess-median": s.percentile(50),
           "edginess-mean": s.mean(),
           "edginess-relStdDev": s.rel_stddev(),
           "edginess-kurtosis": s.kurtosis(),
           "edginess-skewness": s.skewness(),
           "edginess-variance": s.variance()}
    for p in range(10, 100, 10):
        out[f"edginess-{p}-percentile"] = s.percentile(p)
    return out


# ------------------------------------------------------ color / local

def color_features(img: np.ndarray) -> dict:
    """ColorFeatureExtractor.java:13-19: one boolean per palette main
    color, true when detectColors reports it (the repo's documented
    CSS-keyword palette substitutes the bundled colors.csv)."""
    from kgp.multimodal import CSS_BASIC_PALETTE, detect_colors
    mains = {m for _, m in detect_colors(img)}
    names = []
    for _, _, main in CSS_BASIC_PALETTE:
        if main not in names:
            names.append(main)
    return {f"main_color-{n}": n in mains for n in names}


def local_features(img: np.ndarray, divisions: int,
                   extractor) -> dict:
    """LocalFeatureExtractor.java:17-53: run `extractor` per grid cell
    (same cell geometry as GridSimilarityExtractor), features renamed
    to local-<cellIdx>-<name>."""
    if divisions < 2:
        raise ValueError("divisions must be at least 2")
    h, w = img.shape[:2]
    cw, ch = w // divisions, h // divisions
    out = {}
    idx = 0
    for x_idx in range(divisions):
        for y_idx in range(divisions):
            sub = img[y_idx * ch:(y_idx + 1) * ch,
                      x_idx * cw:(x_idx + 1) * cw]
            for k, v in extractor(sub).items():
                out[f"local-{idx}-{k}"] = v
            idx += 1
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
                    round(red.stddev(), 9) + 0.0,
                    round(red.skewness(), 9) + 0.0,
                    round(lum.mean(), 9) + 0.0,
                    round(sym["symmetry-horizontal-red"], 9) + 0.0,
                    round(sym["symmetry-vertical-red"], 9) + 0.0))
            yield pd.DataFrame(rows, columns=[
                "media_id", "width", "height", "ratio", "red_mean",
                "red_min", "red_max", "red_sum", "red_p50",
                "red_stddev", "red_skewness", "lum_mean",
                "sym_h_red", "sym_v_red"])

    return src.mapInPandas(run, GATE_SCHEMA)


def frequency_stage(media: DataFrame) -> DataFrame:
    """detectFrequencies gate subset: (media_id, freq_count,
    freq_mean, freq_median) over the BMP corpus — per-pixel values
    are exact rational sums in the SAME sorted-neighbor order on both
    engines; the cross-pixel mean rounds to 9 (accumulation order),
    the median is a selection (FatStats rule) on identical floats."""
    src = media.where("kind = 'image'").select("media_id", "content")

    def run(batches):
        import pandas as pd
        for pdf in batches:
            rows = []
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                img = decode_bmp(bytes(content))
                s = detect_frequencies(img)
                rows.append((int(mid), s.count(),
                             round(s.mean(), 9) + 0.0,
                             s.median() + 0.0))
            yield pd.DataFrame(rows, columns=[
                "media_id", "freq_count", "freq_mean", "freq_median"])

    return src.mapInPandas(
        run, "media_id long, freq_count int, freq_mean double, "
             "freq_median double")


GRID_GATE_SCHEMA = ("media_id long, sim_min double, sim_max double, "
                    "sim_stddev double, sim_sum double, "
                    "sim_p30 double, sim_p50 double, sim_p80 double")


def grid_similarity_stage(media: DataFrame,
                          divisions: int = 2) -> DataFrame:
    """GridSimilarityExtractor gate subset over the BMP corpus — ONE
    column-pruned Arrow pass. Pair similarities are rounded to 9
    decimals before aggregating (and aggregates again to 9) so the
    numpy and SQL accumulation orders agree; selection stats
    (min/max/percentile) are identical on the rounded values. The
    mean is excluded from the gate subset (exact .5-at-9-decimals
    rounding ties); the pure twin keeps it."""
    src = media.where("kind = 'image'").select("media_id", "content")
    d = divisions

    def run(batches):
        import pandas as pd
        for pdf in batches:
            rows = []
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                img = decode_bmp(bytes(content))
                h, w = img.shape[:2]
                cw, ch = w // d, h // d
                cells = [
                    extract_values(
                        img[y * ch:(y + 1) * ch, x * cw:(x + 1) * cw],
                        "luminosity")
                    for x in range(d) for y in range(d)]
                stats = FatStatsF()
                for i in range(len(cells)):
                    for j in range(i + 1, len(cells)):
                        stats.add(round(_pair_similarity(
                            cells[i], cells[j]), 9))
                # gate stddev: exact integer sample-variance formula
                # over the 1e9-scaled sims -> bit-identical to SQL
                # (Welford in the pure twin rounds differently at
                # exact .5e-9 boundaries)
                iv = [round(v * 1e9) for v in stats.values]
                n = len(iv)
                var_num = n * sum(x * x for x in iv) - sum(iv) ** 2
                stddev = float(np.sqrt(
                    float(var_num) / (n * (n - 1)) / 1e18))
                rows.append((
                    int(mid), stats.min() + 0.0, stats.max() + 0.0,
                    stddev + 0.0,
                    round(stats.sum(), 9) + 0.0,
                    stats.percentile(30) + 0.0,
                    stats.percentile(50) + 0.0,
                    stats.percentile(80) + 0.0))
            yield pd.DataFrame(rows, columns=[
                "media_id", "sim_min", "sim_max",
                "sim_stddev", "sim_sum", "sim_p30", "sim_p50",
                "sim_p80"])

    return src.mapInPandas(run, GRID_GATE_SCHEMA)
