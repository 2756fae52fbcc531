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
