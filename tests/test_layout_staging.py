"""Layout-staging invalidation and concurrency (plans/layout.py).

The r8 adversarial-corpus rewrite exposed that derived layouts keyed
by sf-tag alone served STALE data after an in-place corpus rewrite;
and direct writes to the final path could tear under the documented
two-worker gate split. These tests pin the fixed discipline:
mtime+size-embedded keys, tmp+rename staging, age-gated pruning.
"""

from __future__ import annotations

import os
import time

from gcp_dbt_data_engineering_spark.plans.layout import (
    _prune_stale,
    _sf_tag,
    _stage,
)


def test_sf_tag_rekeys_on_source_rewrite(tmp_path):
    """Rewriting the source table in place must change the artifact
    key — the sf-tag-only key is the r8 stale-layout defect."""
    src = tmp_path / "orders.parquet"
    src.write_bytes(b"v1")
    t1 = _sf_tag(str(tmp_path), "orders")
    time.sleep(0.01)
    src.write_bytes(b"v2-longer")
    t2 = _sf_tag(str(tmp_path), "orders")
    assert t1 != t2
    assert t1.startswith(tmp_path.name) and t2.startswith(tmp_path.name)


def test_stage_rename_loser_cleans_up(tmp_path):
    """Two sessions racing on the same layout: the rename loser drops
    its tmp copy and the winner's complete artifact survives."""
    path = str(tmp_path / "layout")

    def write_v(tag):
        def w(tmp):
            os.makedirs(tmp)
            with open(os.path.join(tmp, "data"), "w") as f:
                f.write(tag)
            open(os.path.join(tmp, "_SUCCESS"), "w").close()
        return w

    _stage(path, write_v("winner"))
    _stage(path, write_v("loser"))  # path exists: rename fails
    with open(os.path.join(path, "data")) as f:
        assert f.read() == "winner"
    leftovers = [d for d in os.listdir(tmp_path) if ".tmp-" in d]
    assert leftovers == []


def test_prune_stale_is_age_gated(tmp_path):
    prefix = str(tmp_path / "orders_orc_")
    old = prefix + "old-key"
    young = prefix + "young-key"
    keep = prefix + "current"
    for d in (old, young, keep):
        os.makedirs(d)
    os.utime(old, (time.time() - 7200, time.time() - 7200))
    _prune_stale(prefix, keep)
    assert not os.path.exists(old)        # past TTL: reaped
    assert os.path.exists(young)          # young: a live session may read it
    assert os.path.exists(keep)


def test_stage_evicts_torn_occupant(tmp_path):
    """A legacy torn directory (exists, no _SUCCESS) must not win the
    rename forever: _stage evicts it and retries once (ADVICE r8 —
    before the fix the spec permanently read the torn layout)."""
    path = str(tmp_path / "layout")
    os.makedirs(path)
    with open(os.path.join(path, "data"), "w") as f:
        f.write("torn")  # no _SUCCESS: a pre-staging-era crash

    def write_good(tmp):
        os.makedirs(tmp)
        with open(os.path.join(tmp, "data"), "w") as f:
            f.write("good")
        open(os.path.join(tmp, "_SUCCESS"), "w").close()

    _stage(path, write_good)
    assert os.path.exists(os.path.join(path, "_SUCCESS"))
    with open(os.path.join(path, "data")) as f:
        assert f.read() == "good"
    leftovers = [d for d in os.listdir(tmp_path) if ".tmp-" in d]
    assert leftovers == []


def test_prune_stale_catalog_is_age_gated(spark, tmp_path, monkeypatch):
    """Catalog twin of the path prune (ADVICE r8): older-keyed
    bucketed tables past the TTL are dropped with their warehouse
    data; young ones and the current key survive."""
    import gcp_dbt_data_engineering_spark.plans.layout as layout

    monkeypatch.setattr(layout, "ART", str(tmp_path))
    rows = spark.range(1)
    names = ("b_lineitem_prune_old", "b_lineitem_prune_young",
             "b_lineitem_prune_keep")
    for name in names:
        path = str(tmp_path / name)
        rows.write.option("path", path).saveAsTable(name)
    old_path = str(tmp_path / names[0])
    os.utime(old_path, (time.time() - 7200, time.time() - 7200))
    try:
        layout._prune_stale_catalog(spark, "b_lineitem_prune_", names[2])
        assert not spark.catalog.tableExists(names[0])
        assert not os.path.exists(old_path)
        assert spark.catalog.tableExists(names[1])
        assert spark.catalog.tableExists(names[2])
    finally:
        for name in names:
            spark.sql(f"DROP TABLE IF EXISTS {name}")
