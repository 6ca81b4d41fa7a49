import numpy as np
import pandas as pd
import pytest

from delivr_cfos_tpu.analysis.group_stats import (
    benjamini_hochberg,
    hierarchical_level_sum,
    level_analysis,
    normalize_to_group_mean,
)
from delivr_cfos_tpu.utils.io.xlsx import read_xlsx, write_xlsx


def _toy_region_table():
    """Ontology: background(0) ← nothing; root(997) ← A(1) ← {B(2), C(3)}."""
    rows = [
        # id, name, acronym, parent_id, parent_acronym, structure-level, graph_order
        (0, "background", "bgr", "None", "None", 0, 0),
        (997, "root", "root", -1, '"root"', 0, 0),
        (1, "Region A", "A", 997, "root", 1, 1),
        (2, "Region B", "B", 1, "A", 2, 2),
        (3, "Region C", "C", 1, "A", 2, 3),
    ]
    df = pd.DataFrame(
        rows,
        columns=[
            "id",
            "name",
            "acronym",
            "parent_id",
            "parent_acronym",
            "structure-level",
            "graph_order",
        ],
    )
    # sample counts live only in the leaves
    df["m1"] = [0, 0, 1.0, 10.0, 5.0]
    df["m2"] = [0, 0, 2.0, 20.0, 6.0]
    return df


def test_hierarchical_sum_accumulates_up_tree():
    df = _toy_region_table()
    out, overcount = hierarchical_level_sum(df, ["m1", "m2"])
    a = out.loc[out["acronym"] == "A"].iloc[0]
    # A gets its own 1 + children 10 + 5
    assert a["m1"] == 16.0
    assert a["m2"] == 28.0
    root = out.loc[out["acronym"] == "root"].iloc[0]
    assert root["m1"] == 16.0  # root accumulates A's total


def test_benjamini_hochberg_matches_known_values():
    p = np.array([0.01, 0.04, 0.03, 0.005])
    reject, adj = benjamini_hochberg(p, alpha=0.1)
    # manual BH: sorted [.005,.01,.03,.04] → adj [.02,.02,.04,.04]
    np.testing.assert_allclose(sorted(adj), [0.02, 0.02, 0.04, 0.04])
    assert reject.all()


def test_benjamini_hochberg_null_case():
    rng = np.random.default_rng(0)
    p = rng.uniform(0.5, 1.0, 50)
    reject, adj = benjamini_hochberg(p, alpha=0.05)
    assert not reject.any()
    assert (adj <= 1).all()


def test_normalize_to_group_mean():
    df = _toy_region_table()
    out = normalize_to_group_mean(df, ["m1", "m2"], ["m1"])
    np.testing.assert_allclose(
        out.loc[out["acronym"] == "B", "m2"].iloc[0], 2.0
    )  # 20 / 10


def test_level_analysis_detects_group_difference():
    rng = np.random.default_rng(1)
    df = _toy_region_table().drop(columns=["m1", "m2"])
    g1 = [f"a{i}" for i in range(6)]
    g2 = [f"b{i}" for i in range(6)]
    for c in g1:
        df[c] = [0, 0, 5, 100 + rng.normal(0, 2), 50 + rng.normal(0, 2)]
    for c in g2:
        df[c] = [0, 0, 5, 300 + rng.normal(0, 2), 50 + rng.normal(0, 2)]
    res = level_analysis(df, {"ctl": g1, "exp": g2}, alpha=0.1, drop_levels_from_top=0)
    stats_df = res["stats"]
    b_rows = stats_df.loc[stats_df["acronym"] == "B"]
    assert len(b_rows)
    assert (b_rows["pvals_corrected_ctl_vs_exp"] < 0.05).all()


def test_xlsx_roundtrip_of_region_table(tmp_path):
    df = _toy_region_table()
    p = str(tmp_path / "overview.xlsx")
    write_xlsx(p, {"Sheet1": df})
    back = read_xlsx(p)
    assert list(back.columns) == list(df.columns)
    assert len(back) == len(df)
    assert back["m1"].tolist() == df["m1"].tolist()
    assert back["name"].tolist() == df["name"].tolist()
