"""BlockCodeExtractor port: palette builds (incl. the FIFTY_ONE
HSBtoRGB overflow chain), pixelate, word structure, shape codes, the
always-zero brightness quirk, and the Spark stage feeding the text
classifier."""

from __future__ import annotations

import numpy as np
import pytest

from kgp.blockcode import (block_code, block_code_stage, build_palette,
                           get_nearest_color, java_hsb_to_rgb,
                           java_rgb_to_hsb, pixelate)
from kgp.multimodal import synth_media, synth_pixel_array

SF_TEST = "/root/testdata/sf0.001"


# ------------------------------------------------------------ palettes

def test_palette_sizes():
    # BLACK+WHITE always; the mode adds the chromatic circle entries
    assert len(build_palette("GREY_SCALE_5")) == 5
    assert len(build_palette("EIGHT")) == 8
    assert len(build_palette("FOURTEEN")) == 14
    assert len(build_palette("TWENTY_EIGHT")) == 28
    # 'FIFTY_ONE' actually builds 28 + 2*23 = 74 entries as written
    # (the first 5 gray entries are skipped) — name kept bug-for-bug
    assert len(build_palette("FIFTY_ONE")) == 74
    assert len(build_palette("TWENTY_EIGHT_AND_BRIGHTNESS_4")) == 28


def test_palette_order_starts_black_white():
    for mode in ("GREY_SCALE_5", "EIGHT", "TWENTY_EIGHT"):
        p = build_palette(mode)
        assert p[0] == (0, 0, 0) and p[1] == (255, 255, 255)


def test_java_hsb_round_trip_on_palette():
    # in-range HSB round-trips every chromatic palette color exactly
    for color in build_palette("TWENTY_EIGHT")[5:]:
        h, s, b = java_rgb_to_hsb(*color)
        assert java_hsb_to_rgb(h, s, b) == color


def test_java_hsb_overflow_is_deterministic():
    """brightness 64.0 (0.25*256) is 255x out of range; the Java
    float->int->shift overflow chain must reproduce identically."""
    h, s, _ = java_rgb_to_hsb(7, 139, 91)
    first = java_hsb_to_rgb(h, s, 0.25 * 256)
    assert java_hsb_to_rgb(h, s, 0.25 * 256) == first
    assert all(0 <= v <= 255 for v in first)


# ------------------------------------------------------------ pixelate

def test_pixelate_top_left_wins():
    img = np.zeros((4, 4, 3), dtype=np.uint8)
    img[0, 0] = (250, 250, 250)
    out = pixelate(img, 4, None)
    assert (out == 250).all()  # whole box takes the top-left pixel


def test_pixelate_quantizes_to_palette():
    img = np.full((4, 4, 3), 200, dtype=np.uint8)
    img[:, :, 0] = 230  # reddish
    pal = build_palette("EIGHT")
    out = pixelate(img, 2, pal)
    assert tuple(out[0, 0]) in pal


def test_get_nearest_color_first_tie_wins():
    pal = [(10, 10, 10), (10, 10, 10), (0, 0, 0)]
    assert get_nearest_color((10, 10, 10), pal) == (10, 10, 10)
    assert get_nearest_color((0, 0, 0), pal) == (0, 0, 0)


# ------------------------------------------------------------- words

def test_block_code_word_structure():
    img = synth_pixel_array(6)
    code = block_code(img, pixelation_size=2, block_size="TWO_BY_TWO",
                      image_sections="TWO_BY_TWO")
    words = code.split(" ")
    assert len(words) == 4  # 10x10 image, word length 4 -> 2x2 words
    for w in words:
        assert w.endswith("!")
        assert w[0].isalpha()          # main color code
        assert w[1] in "01234"         # shape code
        assert w[2].isalpha()          # section char


def test_block_code_uniform_image_shape1():
    img = np.zeros((8, 8, 3), dtype=np.uint8)
    code = block_code(img, pixelation_size=2, block_size="TWO_BY_TWO",
                      image_sections="TWO_BY_TWO")
    # all-black: main color 'a' (palette[0]), shape 1 everywhere
    assert all(w[:2] == "a1" for w in code.split(" "))


def test_block_code_shape_codes_2x2():
    from kgp.blockcode import _code_block
    pal = build_palette("TWENTY_EIGHT")
    blk, wht = (0, 0, 0), (255, 255, 255)
    args = (pal, "TWO_BY_TWO", "TWENTY_EIGHT", False)
    assert _code_block([blk] * 4, 1, *args)[1] == "1"
    # vertical stripes: [0]==[2], [1]==[3]
    assert _code_block([blk, wht, blk, wht], 1, *args)[1] == "2"
    # horizontal stripes: [0]==[1], [2]==[3]
    assert _code_block([blk, blk, wht, wht], 1, *args)[1] == "3"
    # X: [0]==[3], [1]==[2]
    assert _code_block([blk, wht, wht, blk], 1, *args)[1] == "4"


def test_block_code_section_asymmetric_quirk():
    """sx gets +1 but sy does not (codeImage:208-214): top-left block
    is section 1 -> 'a', but a block in the second ROW of sections
    jumps by the section count."""
    img = synth_pixel_array(12)  # 16x9
    code = block_code(img, pixelation_size=2, block_size="TWO_BY_TWO",
                      image_sections="TWO_BY_TWO")
    sections = [w[2] for w in code.split(" ")]
    assert sections[0] == "a"    # sy=0, sx=1 -> 1
    assert "c" in sections or "d" in sections  # second row -> 3/4


def test_block_code_brightness_mode_always_zero():
    img = synth_pixel_array(6)
    code = block_code(img, number_of_colors="TWENTY_EIGHT_AND_BRIGHTNESS_4",
                      pixelation_size=2, block_size="TWO_BY_TWO",
                      image_sections="TWO_BY_TWO")
    # the reference's scale bug makes every color code '0'
    assert all(w[0] == "0" for w in code.split(" "))


def test_block_code_counts_flag():
    img = synth_pixel_array(6)
    code = block_code(img, pixelation_size=2, block_size="TWO_BY_TWO",
                      image_sections="TWO_BY_TWO",
                      number_of_colors_in_code=True)
    assert all(w[0].isdigit() for w in code.split(" "))


def test_block_code_3x3_bounds():
    img = synth_pixel_array(90)  # 12x6 -> word length 6 -> i1-1=1, i2-1=0
    code = block_code(img, pixelation_size=2,
                      block_size="THREE_BY_THREE",
                      image_sections="TWO_BY_TWO")
    assert code == ""  # i2-1 = 0 rows, like the reference
    big = np.zeros((24, 24, 3), dtype=np.uint8)
    code2 = block_code(big, pixelation_size=2,
                       block_size="THREE_BY_THREE",
                       image_sections="THREE_BY_THREE")
    assert len(code2.split(" ")) == 9  # (12//6-1+... ) 3x3 of corners


def test_block_code_rejects_bad_blocksize():
    with pytest.raises(ValueError):
        block_code(synth_pixel_array(6), block_size="FOUR_BY_FOUR")


# ------------------------------------------------------------- stages

def test_block_code_stage_matches_twin(spark):
    docs = spark.read.parquet(f"{SF_TEST}/documents.parquet")
    media = synth_media(spark, docs)
    rows = block_code_stage(media).collect()
    assert len(rows) > 0
    for r in rows[:20]:
        img = synth_pixel_array(r["media_id"])
        assert r["text"] == block_code(
            img, pixelation_size=2, block_size="TWO_BY_TWO",
            image_sections="TWO_BY_TWO")


def test_block_codes_feed_the_text_classifier():
    """The extractor's purpose: image words classify like prose.
    Bright vs dark synthetic images are separable on block codes
    through the UNCHANGED Palladian text classifier."""
    from kgp.textclassifier import (FeatureSetting, classify,
                                    most_likely, train)
    rng = np.random.RandomState(5)

    def make(kind: str) -> str:
        base = 220 if kind == "bright" else 20
        img = (base + rng.randint(-15, 16, (12, 12, 3))) \
            .clip(0, 255).astype(np.uint8)
        return block_code(img, pixelation_size=2,
                          block_size="TWO_BY_TWO",
                          image_sections="TWO_BY_TWO")

    fs = FeatureSetting(mode="word", min_ngram=1, max_ngram=1,
                        min_term_len=1, max_term_len=20)
    model = train([(make(k), k)
                   for k in ("bright", "dark") for _ in range(8)], fs)
    for kind in ("bright", "dark"):
        scores = classify(make(kind), model, fs)
        assert most_likely(scores) == kind


def test_block_codes_duckdb_parity(spark):
    import duckdb

    from kgp.oracle import block_codes_sql
    docs = spark.read.parquet(f"{SF_TEST}/documents.parquet")
    media = synth_media(spark, docs)
    got = {r["media_id"]: r["text"] for r in block_code_stage(
        media, number_of_colors="GREY_SCALE_5", pixelation_size=2,
        block_size="TWO_BY_TWO", image_sections="TWO_BY_TWO").collect()}
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"'{SF_TEST}/documents.parquet'")
    want = con.execute(block_codes_sql()).fetchall()
    assert len(want) == len(got) > 0
    for mid, text in want:
        assert got[mid] == text, mid


def test_block_code_stage_plan_no_shuffle(spark):
    docs = spark.read.parquet(f"{SF_TEST}/documents.parquet")
    media = synth_media(spark, docs)
    plan = block_code_stage(media) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
