"""Upstream helper-math test vectors, transcribed mechanically.

Sources (assertions copied 1:1, no change of expected values):
- SlimStatsTest.java:14-62
- SetSimilaritiesTest.java:22-57
- NumericVectorTest.java:13-59
- NumericMatrixTest.java:10-49
"""

import math

from kgp.mathstats import (NumericMatrix, NumericVector, SlimStats,
                           set_similarity)

DELTA = 0.001


# ----------------------------------------------------- SlimStatsTest


def test_running_stats():
    stats = SlimStats().add(2.0, 1.0, 6.0, 10.0, 23.0, 7.0)
    assert stats.get_count() == 6
    assert abs(stats.get_mean() - 8.167) < 0.001
    assert stats.get_max() == 23
    assert stats.get_min() == 1
    assert abs(stats.get_standard_deviation() - 7.985) < 0.001
    assert abs(stats.get_mse() - 119.833) < 0.001
    assert abs(stats.get_rmse() - 10.947) < 0.001
    assert stats.get_range() == 22
    assert abs(stats.get_relative_standard_deviation() - 0.9778) < 0.001
    assert abs(stats.get_variance() - 63.76667) < 0.001


def test_standard_deviation():
    assert abs(SlimStats().add(2., 4., 4., 4., 5., 5., 7., 9.)
               .get_standard_deviation() - 2.14) < 0.01
    assert abs(SlimStats().add(4, 2, 5, 8, 6)
               .get_standard_deviation() - 2.24) < 0.01
    assert SlimStats().add(1).get_standard_deviation() == 0
    assert math.isnan(SlimStats().get_standard_deviation())


def test_no_values():
    stats = SlimStats()
    assert stats.get_count() == 0
    assert math.isnan(stats.get_max())
    assert math.isnan(stats.get_min())
    assert math.isnan(stats.get_mean())
    assert math.isnan(stats.get_standard_deviation())
    assert stats.get_sum() == 0
    assert math.isnan(stats.get_mse())
    assert math.isnan(stats.get_rmse())
    assert math.isnan(stats.get_range())


def test_overflow():
    double_max = 1.7976931348623157e308
    stats = SlimStats([double_max] * 10000)
    assert stats.get_max() == double_max
    assert stats.get_min() == double_max
    assert stats.get_mean() == double_max
    assert stats.get_standard_deviation() == 0
    assert stats.get_count() == 10000


# ----------------------------------------------- SetSimilaritiesTest

SET1 = {1, 2, 3, 4}
SET2 = {1, 2, 3, 6}
SET3 = {1, 2, 3, 4}
SET4 = {5, 6, 7, 8}
SET5 = {1, 2, 3, 4, 5, 6, 7, 8, 9, 10}
EMPTY = set()


def test_dice():
    assert abs(set_similarity("dice", SET1, SET2) - 0.75) < DELTA
    assert abs(set_similarity("dice", SET1, SET3) - 1.0) < DELTA
    assert abs(set_similarity("dice", SET1, SET4) - 0.0) < DELTA
    assert abs(set_similarity("dice", SET1, SET5) - 0.5714) < DELTA
    assert abs(set_similarity("dice", EMPTY, EMPTY) - 1.0) < DELTA
    assert abs(set_similarity("dice", EMPTY, SET1) - 0.0) < DELTA
    assert abs(set_similarity("dice", SET1, EMPTY) - 0.0) < DELTA


def test_jaccard():
    assert abs(set_similarity("jaccard", SET1, SET2) - 0.6) < DELTA
    assert abs(set_similarity("jaccard", SET1, SET3) - 1.0) < DELTA
    assert abs(set_similarity("jaccard", SET1, SET4) - 0.0) < DELTA
    assert abs(set_similarity("jaccard", SET1, SET5) - 0.4) < DELTA
    assert abs(set_similarity("jaccard", EMPTY, EMPTY) - 1.0) < DELTA
    assert abs(set_similarity("jaccard", EMPTY, SET1) - 0.0) < DELTA
    assert abs(set_similarity("jaccard", SET1, EMPTY) - 0.0) < DELTA


def test_overlap():
    assert abs(set_similarity("overlap", SET1, SET2) - 0.75) < DELTA
    assert abs(set_similarity("overlap", SET1, SET3) - 1.0) < DELTA
    assert abs(set_similarity("overlap", SET1, SET4) - 0.0) < DELTA
    assert abs(set_similarity("overlap", SET1, SET5) - 1.0) < DELTA
    assert abs(set_similarity("overlap", EMPTY, EMPTY) - 1.0) < DELTA
    assert abs(set_similarity("overlap", EMPTY, SET1) - 0.0) < DELTA
    assert abs(set_similarity("overlap", SET1, EMPTY) - 0.0) < DELTA


# ----------------------------------------------- NumericVectorTest


def test_cosine_sim_metric():
    vector1 = NumericVector({"cow": 3., "pig": 2., "dog": 0., "cat": 5.,
                             "log": 0., "bug": 0., "fox": 0., "ape": 2.,
                             "man": 0., "car": 0.})
    vector2 = NumericVector({"cow": 1., "pig": 2., "dog": 0., "cat": 0.,
                             "fox": 0., "ape": 1., "man": 0., "car": 2.})
    vector3 = NumericVector({})

    assert abs(vector1.sum() - 12) < 0.01
    assert abs(vector2.sum() - 6) < 0.01
    assert abs(vector1.norm() - 6.48) < 0.01
    assert abs(vector2.norm() - 3.16) < 0.01
    assert abs(vector1.dot(vector2) - 9) < 0.01
    assert abs(vector1.cosine(vector2) - 0.44) < 0.01
    assert abs(vector1.cosine(vector3) - 0) < 0.01
    assert abs(vector1.euclidean(vector2) - 5.83) < 0.01

    added = vector1.add(vector2)
    assert abs(added.get("cow") - 4) < 0.01
    assert abs(added.get("pig") - 4) < 0.01
    assert abs(added.get("dog") - 0) < 0.01


# ----------------------------------------------- NumericMatrixTest


def test_numeric_matrix():
    matrix1 = NumericMatrix()
    matrix1.set(0, 1, 9.)
    matrix1.set(1, 0, 1.)
    matrix1.set(1, 1, 8.)
    matrix1.set(2, 0, 2.)
    matrix1.set(2, 1, 7.)
    assert matrix1.size() == 6

    matrix2 = NumericMatrix()
    matrix2.set(0, 0, 6.)
    matrix2.set(0, 1, 3.)
    matrix2.set(1, 0, 5.)
    matrix2.set(1, 1, 4.)
    matrix2.set(2, 0, 4.)
    matrix2.set(2, 1, 5.)
    assert matrix2.size() == 6

    total = matrix1.add(matrix2)
    assert total.size() == 6
    assert total.get(0, 0) == 6.
    assert total.get(0, 1) == 12.
    assert total.get(1, 0) == 6.
    assert total.get(1, 1) == 12.

    scalar = matrix1.scalar(2)
    assert scalar.size() == 6
    assert scalar.get(0, 0) == 0.
    assert scalar.get(0, 1) == 18.
    assert scalar.get(1, 0) == 2.
    assert scalar.get(1, 1) == 16.

    row1 = matrix1.get_row(1)
    assert row1.sum() == 24.

    column2 = matrix1.get_column(2)
    assert column2.sum() == 9.
