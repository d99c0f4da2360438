"""Triangle counting: exact vs duckdb triple join, closed-form shapes,
normalization (direction/duplicates/loops), degree cap."""
import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from gojsonschema_ray.stages.graph import triangle_count


def test_triangle_count_closed_forms(ray_session):
    # K4 has C(4,3)=4 triangles, 6 edges
    k4 = [(a, b) for a in range(4) for b in range(4) if a < b]
    df = pd.DataFrame(k4, columns=["u", "v"])
    tri, ne = triangle_count(rd.from_pandas(df), "u", "v")
    assert (tri, ne) == (4, 6)
    # direction, duplicates, and loops normalize away
    messy = pd.DataFrame(
        [(b, a) for a, b in k4] + k4 + [(0, 0), (2, 2)],
        columns=["u", "v"])
    tri, ne = triangle_count(rd.from_pandas(messy).repartition(3),
                             "u", "v")
    assert (tri, ne) == (4, 6)
    # a path has no triangles; a star has none either
    path = pd.DataFrame({"u": [0, 1, 2, 3], "v": [1, 2, 3, 4]})
    assert triangle_count(rd.from_pandas(path), "u", "v") == (0, 4)
    star = pd.DataFrame({"u": [0] * 5, "v": [1, 2, 3, 4, 5]})
    assert triangle_count(rd.from_pandas(star), "u", "v") == (0, 5)


def test_triangle_count_random_vs_sql(ray_session):
    rng = np.random.default_rng(67)
    df = pd.DataFrame({"u": rng.integers(0, 120, 4000),
                       "v": rng.integers(0, 120, 4000)})
    import duckdb

    exp_tri, exp_e = duckdb.sql(
        "WITH e AS (SELECT DISTINCT least(u, v) AS a, greatest(u, v) AS b "
        "FROM df WHERE u != v) "
        "SELECT (SELECT count(*) FROM e e1 "
        "JOIN e e2 ON e1.a = e2.a AND e1.b < e2.b "
        "JOIN e e3 ON e3.a = e1.b AND e3.b = e2.b), "
        "(SELECT count(*) FROM e)").fetchone()
    got = triangle_count(rd.from_pandas(df).repartition(4), "u", "v")
    assert got == (int(exp_tri), int(exp_e))


def test_triangle_degree_cap(ray_session):
    star = pd.DataFrame({"u": [0] * 60, "v": np.arange(1, 61)})
    with pytest.raises(Exception, match="max_degree"):
        triangle_count(rd.from_pandas(star), "u", "v", max_degree=50)
