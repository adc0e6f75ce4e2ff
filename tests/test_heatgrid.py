"""HeatGridGenerator port tests — color coders, Java rounding, the
white-fill/alpha-composite raster, and the Spark grid aggregation
with DuckDB parity."""

from __future__ import annotations

import duckdb
import numpy as np
import pytest

from kgp.heatgrid import (PALETTE, heat_grid_matrix, heat_grid_stage,
                          palette_color, render_heat_grid,
                          transparency_color)
from kgp.multimodal import decode_bmp
from tests.conftest import SF_TEST


def test_palette_color_buckets():
    assert palette_color(0.0) == PALETTE[0]
    assert palette_color(1.0) == PALETTE[15]
    # Math.round(0.5*15) = round(7.5) = 8 (floor(x+0.5), not banker's)
    assert palette_color(0.5) == PALETTE[8]
    assert palette_color(0.1) == PALETTE[2]  # round(1.5) = 2


def test_transparency_color():
    assert transparency_color(0.0) == (0, 0, 0, 0)
    assert transparency_color(1.0, (10, 20, 30)) == (10, 20, 30, 255)
    assert transparency_color(0.5)[3] == 128  # round(127.5) = 128


def test_render_palette_tiles():
    m = np.array([[0.0, 1.0], [0.5, 0.25]])
    img = decode_bmp(render_heat_grid(m, tile_size=3))
    assert img.shape == (6, 6, 3)
    assert tuple(img[0, 0]) == PALETTE[0]
    assert tuple(img[0, 5]) == PALETTE[15]
    assert tuple(img[5, 0]) == PALETTE[8]
    # every pixel of a tile is uniform
    assert (img[0:3, 0:3] == np.array(PALETTE[0])).all()


def test_render_transparency_composites_onto_white():
    m = np.array([[0.0, 1.0]])
    img = decode_bmp(render_heat_grid(m, 2, coder="transparency"))
    assert tuple(img[0, 0]) == (255, 255, 255)  # alpha 0 -> white
    assert tuple(img[0, 2]) == (0, 0, 0)        # alpha 255 -> base
    half = decode_bmp(render_heat_grid(np.array([[0.5]]), 1,
                                       coder="transparency"))
    # 128/255 black over white = 127
    assert tuple(half[0, 0]) == (127, 127, 127)


def test_render_validates_range_and_tile():
    with pytest.raises(ValueError, match="range"):
        render_heat_grid(np.array([[1.5]]), 2)
    with pytest.raises(ValueError, match="range"):
        render_heat_grid(np.array([[-0.1]]), 2)
    with pytest.raises(ValueError, match="tileSize"):
        render_heat_grid(np.array([[0.5]]), 0)


def test_stage_duckdb_parity_and_render(spark):
    events = spark.read.parquet(f"{SF_TEST}/events.parquet")
    from pyspark.sql import functions as F
    grid = heat_grid_stage(
        events.select((F.col("user_id") % 8).alias("r"),
                      (F.col("event_id") % 12).alias("c")), "r", "c")
    got = [(r["row"], r["col"], r["n"], round(r["intensity"], 9),
            r["bucket"], r["color_hex"])
           for r in grid.orderBy("row", "col").collect()]
    want = duckdb.sql(f"""
        WITH g AS (SELECT user_id % 8 AS row, event_id % 12 AS col,
                          count(*) AS n
                   FROM '{SF_TEST}/events.parquet' GROUP BY 1, 2)
        SELECT row, col, n, round(n / max(n) OVER (), 9),
               CAST(floor(n / max(n) OVER () * 15 + 0.5) AS INT)
        FROM g ORDER BY row, col""").fetchall()
    for (grow, gcol, gn, gint, gbuck, ghex), (row, col, n, i, b) in zip(
            got, want):
        assert (grow, gcol, gn) == (row, col, n)
        assert gint == pytest.approx(float(i))
        assert gbuck == b
        assert ghex == "#%02x%02x%02x" % PALETTE[b]
    # grid rows render to a real image
    rows = grid.collect()
    m = heat_grid_matrix(rows, 8, 12)
    img = decode_bmp(render_heat_grid(m, 2))
    assert img.shape == (16, 24, 3)
