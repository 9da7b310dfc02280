"""REST job/config/admin API handlers (S11 write side, round-4).

Reference: openapi.yaml /admin /config /job endpoints; api/JobManager +
api/impl/JobWorker lifecycle. The full INJECT → GENERATE → FETCH → PARSE →
UPDATEDB → INVERTLINKS → DEDUP chain runs through create_job with results
flowing through the server's table registry; abort maps to Spark's
cancelJobGroup.
"""

from __future__ import annotations

import time

import pytest

from nutch_spark.sources.jobs import NutchServer


@pytest.fixture()
def server(spark):
    return NutchServer(spark)


def test_config_endpoints(server):
    assert server.get_configs() == ["default"]
    cid = server.create_config("c1", {"fetcher.threads": "4"})
    assert cid == "c1"
    assert server.get_config("c1") == {"fetcher.threads": "4"}
    assert server.get_config_property("c1", "fetcher.threads") == "4"
    with pytest.raises(ValueError):
        server.create_config("c1", {})
    server.create_config("c1", {"x": "y"}, force=True)
    assert server.get_config("c1") == {"x": "y"}
    with pytest.raises(ValueError):
        server.delete_config("default")
    server.delete_config("c1")
    assert server.get_configs() == ["default"]


def test_full_crawl_job_chain(server):
    urls = [f"http://seed{i}.example.com/" for i in range(20)]
    j = server.create_job({"type": "INJECT", "args": {"urls": urls}}, sync=True)
    assert j["state"] == "FINISHED", j["msg"]
    assert j["result"]["dbUpdates"] == 20

    j = server.create_job(
        {"type": "GENERATE", "crawlId": "c1", "args": {"topN": 10}}, sync=True
    )
    assert j["state"] == "FINISHED", j["msg"]
    assert j["result"]["fetchlistRows"] == 10

    for jtype, key in (
        ("FETCH", "pagesFetched"),
        ("PARSE", "pagesParsed"),
        ("UPDATEDB", "dbUpdates"),
        ("INVERTLINKS", "linkdbRows"),
        ("DEDUP", "dbUpdates"),
    ):
        j = server.create_job({"type": jtype, "crawlId": "c1"}, sync=True)
        assert j["state"] == "FINISHED", (jtype, j["msg"])
        assert j["result"][key] >= 0

    # updatedb grew the frontier beyond the 20 seeds (outlinks discovered)
    assert server.tables["crawldb"].count() > 20

    j = server.create_job({"type": "READDB"}, sync=True)
    assert j["state"] == "FINISHED"
    assert j["result"]["global"][0]["total_urls"] == server.tables["crawldb"].count()

    # job history filters by crawlId (openapi /job?crawlId=)
    assert len(server.get_jobs()) == 8
    assert {x["type"] for x in server.get_jobs(crawl_id="c1")} == {
        "GENERATE", "FETCH", "PARSE", "UPDATEDB", "INVERTLINKS", "DEDUP",
    }


def test_class_job_and_failure_state(server, spark):
    ok = server.create_job(
        {"type": "CLASS", "jobClassName": lambda args: {"n": spark.range(100).count()}},
        sync=True,
    )
    assert ok["state"] == "FINISHED" and ok["result"]["n"] == 100

    bad = server.create_job(
        {"type": "CLASS", "jobClassName": lambda args: 1 / 0}, sync=True
    )
    assert bad["state"] == "FAILED"
    assert "ZeroDivisionError" in bad["msg"]
    with pytest.raises(ValueError):
        server.create_job({"type": "NOPE"})
    with pytest.raises(ValueError):
        server.create_job({"type": "READDB", "confId": "missing"})


def test_abort_cancels_spark_job_group(server, spark):
    def slow(args):
        # big enough to outlive the abort call; cancelJobGroup kills it
        return {"n": spark.range(0, 1 << 36, 1, 64).selectExpr("sum(id)").collect()}

    j = server.create_job({"type": "CLASS", "jobClassName": slow})
    deadline = time.monotonic() + 10
    while server.get_job(j["id"])["state"] == "IDLE" and time.monotonic() < deadline:
        time.sleep(0.05)
    time.sleep(0.5)  # let tasks actually launch
    assert server.abort_job(j["id"]) is True
    assert server.get_job(j["id"])["state"] == "KILLED"
    # a finished job cannot be aborted or stopped
    assert server.abort_job(j["id"]) is False
    assert server.stop_job(j["id"]) is False


def test_server_status_and_stop(server, spark):
    server.create_job(
        {"type": "CLASS", "jobClassName": lambda args: {"ok": 1}}, sync=True
    )
    status = server.server_status()
    assert status["configuration"] == ["default"]
    assert len(status["jobs"]) == 1 and status["runningJobs"] == []
    assert server.stop_server() is True

    slow = server.create_job(
        {
            "type": "CLASS",
            "jobClassName": lambda args: {
                "n": spark.range(0, 1 << 36, 1, 64).selectExpr("sum(id)").collect()
            },
        }
    )
    deadline = time.monotonic() + 10
    while server.get_job(slow["id"])["state"] == "IDLE" and time.monotonic() < deadline:
        time.sleep(0.05)
    time.sleep(0.3)
    assert server.stop_server(force=False) is False  # refuses while running
    assert server.stop_server(force=True) is True
    assert server.get_job(slow["id"])["state"] in ("KILLED", "FINISHED")


def test_config_properties_drive_jobs(server):
    # generate.max.count via a named config actually changes GENERATE output
    from nutch_spark.config import NutchConfig

    cfg = NutchConfig.from_properties(
        {
            "generate.max.count": "2",
            "db.fetch.retry.max": "7",
            "db.injector.update": "true",
            "fetcher.timelimit.mins": "2",
            "some.plugin.key": "x",
        }
    )
    assert cfg.generate_max_count == 2
    assert cfg.retry_max == 7
    assert cfg.inject_update is True
    assert cfg.fetcher_time_limit_s == 120.0
    assert cfg.extras == {"some.plugin.key": "x"}

    # end to end: 20 urls on ONE host; max.count=2 caps the fetchlist at 2
    urls = [f"http://onehost.example.com/p{i}" for i in range(20)]
    server.create_job({"type": "INJECT", "args": {"urls": urls}}, sync=True)
    server.create_config("capped", {"generate.max.count": "2"})
    j = server.create_job(
        {"type": "GENERATE", "confId": "capped", "args": {"topN": 100}}, sync=True
    )
    assert j["state"] == "FINISHED", j["msg"]
    assert j["result"]["fetchlistRows"] == 2


def test_stop_job_reports_stopped_not_failed(server, spark):
    # review regression: a deliberate graceful stop must not surface FAILED
    slow = server.create_job(
        {
            "type": "CLASS",
            "jobClassName": lambda args: {
                "n": spark.range(0, 1 << 36, 1, 64).selectExpr("sum(id)").collect()
            },
        }
    )
    deadline = time.monotonic() + 10
    while server.get_job(slow["id"])["state"] == "IDLE" and time.monotonic() < deadline:
        time.sleep(0.05)
    time.sleep(0.5)
    assert server.stop_job(slow["id"]) is True
    # the job is ACTIVE (STOPPING) until its thread unwinds: a non-forced
    # server stop must refuse while the Spark job group may still run
    state_now = server.get_job(slow["id"])["state"]
    if state_now == "STOPPING":
        assert server.stop_server(force=False) is False
    server.jobs[slow["id"]]._thread.join(timeout=30)
    info = server.get_job(slow["id"])
    assert info["state"] == "KILLED", info
    assert info["msg"] == "stopped"
