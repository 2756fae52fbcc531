"""Orchestration layer (DAG ordering, retries, skip-on-upstream-fail)
and the DQ threshold-verdict + notification routing."""

from __future__ import annotations

import pytest

from gcp_dbt_data_engineering_spark.operators.dq import (
    CUSTOMER_DQ_CONFIG,
    DQEngine,
    apply_thresholds,
    route_notifications,
)
from gcp_dbt_data_engineering_spark.orchestration import (
    JobSpec,
    LocalScheduler,
    daily_pipeline,
)

SF = "/root/testdata/sf0.001"


def test_scheduler_order_retries_and_skip():
    calls: list[str] = []
    flaky_state = {"n": 0}

    def ok():
        calls.append("a")

    def flaky():
        calls.append("b")
        flaky_state["n"] += 1
        if flaky_state["n"] == 1:
            raise RuntimeError("transient")

    def broken():
        calls.append("c")
        raise RuntimeError("always")

    def downstream():
        calls.append("d")

    res = LocalScheduler(
        [
            JobSpec("a", ok),
            JobSpec("b", flaky, depends_on=["a"], retries=1),
            JobSpec("c", broken, depends_on=["a"], retries=1),
            JobSpec("d", downstream, depends_on=["c"]),
        ]
    ).run()
    assert res["a"].status == "SUCCESS" and res["a"].attempts == 1
    assert res["b"].status == "SUCCESS" and res["b"].attempts == 2
    assert res["c"].status == "FAILED" and res["c"].attempts == 2
    assert res["d"].status == "SKIPPED" and "d" not in calls
    assert calls.index("a") < calls.index("b")


def test_scheduler_rejects_bad_graphs():
    with pytest.raises(ValueError):
        LocalScheduler([JobSpec("a", lambda: None, depends_on=["ghost"])])
    with pytest.raises(ValueError):
        LocalScheduler([JobSpec("a", lambda: None), JobSpec("a", lambda: None)])


def test_daily_pipeline_runs_profiling_before_dq(spark):
    res = LocalScheduler(daily_pipeline(SF)).run(spark=spark)
    assert {r.status for r in res.values()} == {"SUCCESS"}
    assert res["data_profiling"].result.count() > 0
    assert res["dq_customer"].result.count() > 0


def test_thresholds_and_notifications(spark):
    results = DQEngine(spark).run(CUSTOMER_DQ_CONFIG, sf_dir=SF)
    cfg = {
        **CUSTOMER_DQ_CONFIG,
        "notifications": {
            "on_failure": ["oncall@example.com"],
            "on_warning": ["team@example.com"],
        },
    }
    verdicts = apply_thresholds(results, cfg)
    rows = [r.asDict() for r in verdicts.collect()]
    assert {r["verdict"] for r in rows} <= {"PASS", "WARN", "FAIL", "SKIPPED"}
    # zero-failure checks must stay PASS; failing checks must not be PASS
    for r in rows:
        if r["status"] == "PASS":
            assert r["verdict"] == "PASS"
        if r["status"] == "FAIL":
            assert r["verdict"] in ("WARN", "FAIL")
    payloads = route_notifications(rows, cfg)
    levels = {p["level"] for p in payloads}
    if any(r["verdict"] == "FAIL" for r in rows):
        assert "failure" in levels
    for p in payloads:
        assert p["recipients"] and p["tests"]


def test_notification_delivery_end_to_end(spark, tmp_path):
    """A failing DQ check must produce a delivered failure payload
    through the pipeline's notify job — both the in-memory LogSender
    and the durable FileSender paths."""
    import json

    from gcp_dbt_data_engineering_spark.operators.dq import (
        FileSender,
        LogSender,
    )

    sender = LogSender()
    res = LocalScheduler(daily_pipeline(SF, sender=sender)).run(spark=spark)
    assert res["dq_notify"].status == "SUCCESS"
    # customer config plants a by-design failing format check
    assert any(p["level"] == "failure" for p in sender.sent)
    assert all(p["recipients"] for p in sender.sent)
    assert res["dq_notify"].result == sender.sent

    path = str(tmp_path / "notifications.jsonl")
    fs = FileSender(path)
    for p in sender.sent:
        fs.send(p)
    lines = [json.loads(x) for x in open(path)]
    assert lines == sender.sent
