"""Heat-grid rendering — port of the reference's numeric-matrix
visualizer (extraction/multimedia/HeatGridGenerator.java):

- PaletteColorCoder (:40-78): 16 fixed RGB colors (alpha 255, the
  constants at :53-69); bucket = Math.round(intensity * (size-1)).
- TransparencyColorCoder (:81-99): one base color, alpha =
  Math.round(intensity * 255).
- generateHeatGrid (:128-160): image = columns*tileSize x
  rows*tileSize, WHITE-filled first, one filled square per cell;
  values outside [0,1] throw IllegalArgumentException; missing
  NumericMatrix entries read as 0.

The reference draws through Graphics2D onto TYPE_INT_ARGB and saves
with ImageIO; here the raster math is explicit numpy — alpha colors
composite SRC_OVER onto the white fill (out = a*c + (1-a)*white) —
and the bytes go through the repo's pure-numpy BMP encoder (this
container has no PNG codec; the observable pixel math is identical).

Spark front (beyond-reference plumbing, like the host-graph
aggregation): the reference receives an already-[0,1] matrix; at
table scale the matrix is ONE groupBy(row, col) count with the
max-normalization window running on the grid-sized count table, and
bucket/color resolved JVM-side from the palette array literal.
"""

from __future__ import annotations

import math

import numpy as np
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from kgp.multimodal import encode_bmp

# HeatGridGenerator.java:53-69 (RGB, alpha 255)
PALETTE: list[tuple[int, int, int]] = [
    (0, 4, 114), (46, 49, 146), (69, 85, 163), (90, 118, 181),
    (115, 154, 200), (138, 170, 211), (163, 187, 225), (188, 204, 237),
    (97, 220, 104), (170, 234, 0), (255, 222, 0), (255, 192, 0),
    (248, 170, 0), (246, 124, 0), (226, 91, 36), (212, 0, 0),
]

# ------------------------------------------------------------ pure twins


def _java_round(x: float) -> int:
    """java.lang.Math.round(double) = floor(x + 0.5)."""
    return int(math.floor(x + 0.5))


def palette_color(intensity: float,
                  palette: list[tuple[int, int, int]] | None = None
                  ) -> tuple[int, int, int]:
    """PaletteColorCoder.getColor (:73-76)."""
    palette = PALETTE if palette is None else palette
    bucket = _java_round(intensity * (len(palette) - 1))
    return palette[bucket]


def transparency_color(intensity: float,
                       base: tuple[int, int, int] = (0, 0, 0)
                       ) -> tuple[int, int, int, int]:
    """TransparencyColorCoder.getColor (:95-98): (r, g, b, alpha)."""
    return base + (_java_round(intensity * 255),)


def render_heat_grid(matrix: np.ndarray, tile_size: int,
                     coder: str = "palette",
                     base: tuple[int, int, int] = (0, 0, 0)) -> bytes:
    """generateHeatGrid (:128-160) → BMP bytes: rows*cols tiles over a
    WHITE fill; 'palette' tiles are opaque, 'transparency' tiles
    SRC_OVER-composite the base color onto the white background."""
    data = np.asarray(matrix, dtype=np.float64)
    rows, cols = data.shape
    if tile_size <= 0:
        raise ValueError("tileSize must be greater zero")
    img = np.full((rows * tile_size, cols * tile_size, 3), 255,
                  dtype=np.uint8)
    for r in range(rows):
        for c in range(cols):
            value = data[r, c]
            if value < 0 or value > 1:
                raise ValueError("The values must be in range [0,1].")
            if coder == "palette":
                rgb = np.array(palette_color(value), dtype=np.float64)
            else:
                pr, pg, pb, alpha = transparency_color(value, base)
                a = alpha / 255.0
                rgb = (a * np.array([pr, pg, pb], dtype=np.float64)
                       + (1 - a) * 255.0)
            img[r * tile_size:(r + 1) * tile_size,
                c * tile_size:(c + 1) * tile_size] = \
                np.round(rgb).astype(np.uint8)
    return encode_bmp(img)


# ------------------------------------------------------------ Spark side


def heat_grid_stage(df: DataFrame, row_col, col_col,
                    palette: list[tuple[int, int, int]] | None = None
                    ) -> DataFrame:
    """(row, col, n, intensity, bucket, color_hex): ONE
    groupBy(row, col) count, intensity = n / max(n) (so the grid is
    the reference's [0,1] matrix), bucket/color via the palette array
    literal — all JVM columns; the normalization window runs on the
    grid-sized count table only."""
    palette = PALETTE if palette is None else palette
    colors = F.array(*[
        F.lit("#%02x%02x%02x" % rgb) for rgb in palette])
    counts = (df.groupBy(F.col(row_col).alias("row"),
                         F.col(col_col).alias("col"))
              .agg(F.count("*").alias("n")))
    w = Window.partitionBy()
    grid = counts.withColumn(
        "intensity", F.col("n") / F.max("n").over(w))
    bucket = F.floor(F.col("intensity") * (len(palette) - 1)
                     + F.lit(0.5)).cast("int")
    return (grid.withColumn("bucket", bucket)
            .withColumn("color_hex",
                        F.element_at(colors, F.col("bucket") + 1)))


def heat_grid_matrix(grid_rows: list, n_rows: int,
                     n_cols: int) -> np.ndarray:
    """Grid rows (row, col, intensity) → dense [0,1] matrix; missing
    cells are 0 like NumericMatrix.get's default."""
    m = np.zeros((n_rows, n_cols), dtype=np.float64)
    for r in grid_rows:
        m[int(r["row"]), int(r["col"])] = float(r["intensity"])
    return m
