"""S11 (write side) — the REST job/config/admin API as a handler layer.

Reference: /root/reference/openapi.yaml:66-533 (/admin, /config, /job
endpoints), backed by api/JobManager + api/impl/JobWorker (job thread with
IDLE/RUNNING/FINISHED/FAILED/KILLED lifecycle) and ConfManager.

Spark shape: one job = one named SPARK JOB GROUP. ``create_job`` runs the
operator pipeline for the job type on a daemon thread inside
``setJobGroup(job_id)``; ``abort_job`` maps to
``SparkContext.cancelJobGroup(job_id)`` — Spark's native kill switch — so
an abort cancels every task of exactly that job and nothing else, the same
isolation the reference gets from killing the Hadoop job. Results land
back in the server's table registry (the in-memory analogue of the crawl
directory), so a GENERATE job's output is the next FETCH job's input.

No HTTP server ships here (serving is deployment-specific; the reference
embeds Jetty) — these handlers return the JSON-shaped dicts the endpoints
respond with.
"""

from __future__ import annotations

import threading
import time
import uuid
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# openapi.yaml:1252-1265 JobType / :1267-1278 State
JOB_TYPES = (
    "INJECT",
    "GENERATE",
    "FETCH",
    "PARSE",
    "UPDATEDB",
    "INDEX",
    "READDB",
    "CLASS",
    "INVERTLINKS",
    "DEDUP",
)


class Job:
    """One job's lifecycle record (api/model/response/JobInfo)."""

    def __init__(self, job_id: str, jtype: str, conf_id: str, args: dict) -> None:
        self.id = job_id
        self.type = jtype
        self.conf_id = conf_id
        self.args = args
        self.state = "IDLE"
        self.msg = "idle"
        self.result: dict | None = None
        self.crawl_id = args.get("crawlId", "")
        self._thread: threading.Thread | None = None
        # Serializes state transitions between the runner thread's terminal
        # FINISHED/FAILED set and stop/abort's check-then-set — without it an
        # abort racing a normal finish can strand the job in KILLING (an
        # _ACTIVE_STATES member), making server_status report it forever.
        self._state_lock = threading.Lock()

    def info(self) -> dict:
        return {
            "id": self.id,
            "type": self.type,
            "confId": self.conf_id,
            "args": self.args,
            "result": self.result,
            "state": self.state,
            "msg": self.msg,
            "crawlId": self.crawl_id,
        }


class NutchServer:
    """Job + config + admin handlers over an operator-table registry.

    ``tables`` maps logical names (crawldb, fetchlist, fetch_log,
    parse_data, linkdb, seeds) to DataFrames; jobs read and replace entries
    the way the reference's jobs read and write crawl directories.
    """

    def __init__(
        self,
        spark: SparkSession,
        tables: dict[str, DataFrame] | None = None,
        configs: dict[str, dict] | None = None,
    ) -> None:
        self.spark = spark
        self.tables = dict(tables or {})
        self.configs = {"default": {}, **(configs or {})}
        self.jobs: dict[str, Job] = {}
        self.start_date = time.time()

    # states whose runner thread / Spark job group may still be executing
    # (cancelJobGroup is async; abort joins precisely because work continues)
    _ACTIVE_STATES = ("RUNNING", "STOPPING", "KILLING")

    # -- /admin (openapi.yaml:70-127) ---------------------------------------
    def server_status(self) -> dict:
        return {
            "startDate": self.start_date,
            "configuration": sorted(self.configs),
            "jobs": [j.info() for j in self.jobs.values()],
            "runningJobs": [
                j.info() for j in self.jobs.values() if j.state in self._ACTIVE_STATES
            ],
        }

    def stop_server(self, force: bool = False) -> bool:
        running = [j for j in self.jobs.values() if j.state in self._ACTIVE_STATES]
        if running and not force:
            return False  # refuse while jobs run, openapi.yaml:96-99
        for j in running:
            self.abort_job(j.id)
        return True

    # -- /config (openapi.yaml:129-288, ConfManager) ------------------------
    def get_configs(self) -> list[str]:
        return sorted(self.configs)

    def get_config(self, config_id: str) -> dict:
        return dict(self.configs[config_id])

    def get_config_property(self, config_id: str, prop: str) -> Any:
        return self.configs[config_id].get(prop)

    def create_config(self, config_id: str | None, props: dict, *, force: bool = False) -> str:
        cid = config_id or uuid.uuid4().hex[:8]
        if cid in self.configs and not force:
            raise ValueError(f"config {cid!r} exists (pass force to replace)")
        self.configs[cid] = dict(props)
        return cid

    def delete_config(self, config_id: str) -> None:
        if config_id == "default":
            raise ValueError("the default config cannot be deleted")
        self.configs.pop(config_id, None)

    # -- /job (openapi.yaml:290-533, JobManager) ----------------------------
    def get_jobs(self, crawl_id: str | None = None) -> list[dict]:
        return [
            j.info()
            for j in self.jobs.values()
            if crawl_id is None or j.crawl_id == crawl_id
        ]

    def get_job(self, job_id: str) -> dict:
        return self.jobs[job_id].info()

    def create_job(self, job_config: dict, *, sync: bool = False) -> dict:
        """POST /job/create. ``sync=True`` blocks until the job ends (tests
        and scripted pipelines); the REST deployment uses the default async
        thread, polling /job/{id} like the reference client does."""
        jtype = job_config["type"]
        if jtype not in JOB_TYPES:
            raise ValueError(f"unknown job type {jtype!r}")
        conf_id = job_config.get("confId", "default")
        if conf_id not in self.configs:
            raise ValueError(f"unknown confId {conf_id!r}")
        args = dict(job_config.get("args") or {})
        if "crawlId" in job_config:
            args.setdefault("crawlId", job_config["crawlId"])
        job = Job(f"{jtype.lower()}-{uuid.uuid4().hex[:8]}", jtype, conf_id, args)
        if jtype == "CLASS":
            user_fn = job_config["jobClassName"]  # takes (args) like the ref
            runner = lambda args, cfg: user_fn(args)  # noqa: E731
        else:
            runner = getattr(self, f"_run_{jtype.lower()}")
        self.jobs[job.id] = job

        from nutch_spark.config import NutchConfig

        cfg = NutchConfig.from_properties(self.configs[conf_id])

        def run() -> None:
            job.state, job.msg = "RUNNING", "running"
            sc = self.spark.sparkContext
            sc.setJobGroup(job.id, f"nutch job {job.id}", interruptOnCancel=True)
            try:
                job.result = runner(job.args, cfg) or {}
                with job._state_lock:
                    job.state, job.msg = "FINISHED", "ok"
            except Exception as e:  # cancellation surfaces as a Py4J error
                with job._state_lock:
                    if job.state == "KILLING":
                        job.state, job.msg = "KILLED", "aborted"
                    elif job.state == "STOPPING":
                        # a deliberate graceful stop must not read as a failure
                        job.state, job.msg = "KILLED", "stopped"
                    else:
                        job.state, job.msg = "FAILED", f"{type(e).__name__}: {e}"
            finally:
                sc.setJobGroup("", "")

        job._thread = threading.Thread(target=run, daemon=True)
        job._thread.start()
        if sync:
            job._thread.join()
        return job.info()

    def stop_job(self, job_id: str) -> bool:
        """Graceful stop — same cancellation as abort but reported as a
        STOPPING transition (the reference's stop asks the job to finish;
        Spark's unit of graceful is the job group)."""
        job = self.jobs[job_id]
        with job._state_lock:
            if job.state != "RUNNING":
                return False
            job.state = "STOPPING"
        self.spark.sparkContext.cancelJobGroup(job_id)
        return True

    def abort_job(self, job_id: str) -> bool:
        job = self.jobs[job_id]
        with job._state_lock:
            if job.state not in ("RUNNING", "STOPPING"):
                return False
            job.state = "KILLING"
        self.spark.sparkContext.cancelJobGroup(job_id)
        if job._thread is not None:
            job._thread.join(timeout=30)
        return job.state == "KILLED"

    # -- job runners: operator dispatch -------------------------------------
    def _materialize(self, name: str, df: DataFrame) -> int:
        """Install a job's output table eagerly (the segment/db write)."""
        df = df.localCheckpoint(eager=True)
        self.tables[name] = df
        return df.count()

    def _run_inject(self, args: dict, cfg=None) -> dict:
        from nutch_spark.config import DEFAULT
        from nutch_spark.operators.inject import inject
        from nutch_spark.schemas import CRAWLDB, SEEDS

        urls = args.get("urls") or []
        seeds = self.spark.createDataFrame([(u, {}) for u in urls], SEEDS)
        db = self.tables.get("crawldb")
        if db is None:
            db = self.spark.createDataFrame([], CRAWLDB)
        merged = inject(db, seeds, cfg=cfg or DEFAULT)
        return {"dbUpdates": self._materialize("crawldb", merged)}

    def _run_generate(self, args: dict, cfg=None) -> dict:
        from nutch_spark.config import DEFAULT
        from nutch_spark.operators.generate import generate

        fl = generate(
            self.tables["crawldb"],
            int(args.get("topN", 1000)),
            cfg=cfg or DEFAULT,
            now=F.lit(args["now"]).cast("timestamp") if "now" in args else None,
        )
        return {"fetchlistRows": self._materialize("fetchlist", fl)}

    def _run_fetch(self, args: dict, cfg=None) -> dict:
        from nutch_spark.config import DEFAULT
        from nutch_spark.operators.fetcher import fetch, synthetic_fetch_fn

        cfg = cfg or DEFAULT
        log = fetch(
            self.tables["fetchlist"],
            cfg=cfg,
            fetch_fn=args.get("fetch_fn", synthetic_fetch_fn),
            # args override; otherwise the config's politeness/redirect knobs
            crawl_delay_s=float(args.get("crawlDelay", cfg.fetcher_server_delay)),
            threads=int(args.get("threads", cfg.fetcher_threads)),
            max_redirects=int(args.get("maxRedirects", cfg.redirect_max)),
        )
        return {"pagesFetched": self._materialize("fetch_log", log)}

    def _run_parse(self, args: dict, cfg=None) -> dict:
        from nutch_spark.config import DEFAULT
        from nutch_spark.operators.fetcher import parse

        pd_ = parse(self.tables["fetch_log"], cfg=cfg or DEFAULT)
        return {"pagesParsed": self._materialize("parse_data", pd_)}

    def _run_updatedb(self, args: dict, cfg=None) -> dict:
        from nutch_spark.config import DEFAULT
        from nutch_spark.operators.fetcher import emit_parse_rows
        from nutch_spark.operators.updatedb import update_crawldb

        cfg = cfg or DEFAULT
        db = self.tables["crawldb"]
        emits = emit_parse_rows(
            self.tables["parse_data"], db.select("url", "score"), cfg=cfg
        )
        fetch_rows = self.tables["fetch_log"].select(
            "url", "status", "fetch_time", "signature", "metadata"
        )
        new_db = update_crawldb(db, fetch_rows, emits, cfg=cfg)
        return {"dbUpdates": self._materialize("crawldb", new_db)}

    def _run_invertlinks(self, args: dict, cfg=None) -> dict:
        from nutch_spark.config import DEFAULT
        from nutch_spark.operators.invertlinks import invert_links

        linkdb = invert_links(self.tables["parse_data"], cfg=cfg or DEFAULT)
        return {"linkdbRows": self._materialize("linkdb", linkdb)}

    def _run_dedup(self, args: dict, cfg=None) -> dict:
        from nutch_spark.config import DEFAULT
        from nutch_spark.operators.dedup import deduplicate

        return {
            "dbUpdates": self._materialize(
                "crawldb", deduplicate(self.tables["crawldb"], cfg=cfg or DEFAULT)
            )
        }

    def _run_readdb(self, args: dict, cfg=None) -> dict:
        from nutch_spark.operators.stats import crawldb_stats

        sections = crawldb_stats(self.tables["crawldb"])
        return {
            name: [r.asDict(recursive=True) for r in df.collect()]
            for name, df in sections.items()
        }

    def _run_index(self, args: dict, cfg=None) -> dict:
        from nutch_spark.sources.indexers import JsonlIndexWriter, index_documents

        docs = self.tables[args.get("table", "parse_data")].withColumn(
            "action", F.lit("ADD")
        )
        directory = args["outputDir"]
        index_documents(docs, {"file": lambda: JsonlIndexWriter(directory)})
        return {"indexed": docs.count()}


# ---------------------------------------------------------------------------
# HTTP layer — NutchServer.java:75-130 embeds a CXF JAX-RS endpoint; here the
# same resource routes (openapi.yaml: /admin, /config, /job) ride a stdlib
# ThreadingHTTPServer so `python -m nutch_spark startserver` is deployable
# without any web framework.  Handlers stay pure (tested directly); this
# layer only routes + (de)serializes.
# ---------------------------------------------------------------------------


def make_http_handler(server: "NutchServer"):
    import json as _json
    from http.server import BaseHTTPRequestHandler

    class Handler(BaseHTTPRequestHandler):
        def _send(self, obj, code: int = 200) -> None:
            body = _json.dumps(obj, default=str).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def _route(self, method: str) -> None:
            parts = [p for p in self.path.split("?")[0].split("/") if p]
            q = {}
            if "?" in self.path:
                from urllib.parse import parse_qsl

                q = dict(parse_qsl(self.path.split("?", 1)[1]))
            body = {}
            length = int(self.headers.get("Content-Length") or 0)
            if length:
                try:
                    body = _json.loads(self.rfile.read(length) or b"{}")
                except (_json.JSONDecodeError, UnicodeDecodeError) as e:
                    # malformed request body is the CLIENT's error (400),
                    # not a create_config conflict (ValueError -> 409)
                    self._send({"error": f"bad request body: {e}"}, 400)
                    return
            try:
                self._send(self._dispatch(method, parts, q, body))
            except (KeyError, IndexError):
                self._send({"error": "not found"}, 404)
            except ValueError as e:
                self._send({"error": str(e)}, 409)

        def _dispatch(self, method: str, parts: list[str], q: dict, body: dict):
            if parts == ["admin"]:
                return server.server_status()
            if parts == ["admin", "stop"]:
                stopped = server.stop_server(force=q.get("force") == "true")
                if stopped:
                    # terminate the HTTP loop too (NutchServer.java stops
                    # the embedded endpoint); shutdown() must run off the
                    # handler thread or serve_forever deadlocks
                    threading.Thread(
                        target=self.server.shutdown, daemon=True
                    ).start()
                return {"stopped": stopped}
            if parts == ["config"]:
                if method == "POST":
                    return {
                        "id": server.create_config(
                            body.get("configId"),
                            body.get("params", {}),
                            force=bool(body.get("force")),
                        )
                    }
                return server.get_configs()
            if parts[0] == "config" and len(parts) == 2:
                if method == "DELETE":
                    server.delete_config(parts[1])
                    return {"deleted": parts[1]}
                return server.get_config(parts[1])
            if parts[0] == "config" and len(parts) == 3:
                return {parts[2]: server.get_config_property(parts[1], parts[2])}
            if parts == ["job"]:
                return server.get_jobs(q.get("crawlId"))
            if parts == ["job", "create"] and method == "POST":
                return server.create_job(body)
            if parts[0] == "job" and len(parts) == 2:
                return server.get_job(parts[1])
            if parts[0] == "job" and len(parts) == 3 and parts[2] == "stop":
                return {"stopping": server.stop_job(parts[1])}
            if parts[0] == "job" and len(parts) == 3 and parts[2] == "abort":
                return {"aborting": server.abort_job(parts[1])}
            raise KeyError(self.path)

        def do_GET(self):  # noqa: N802 (stdlib naming)
            self._route("GET")

        def do_POST(self):  # noqa: N802
            self._route("POST")

        def do_DELETE(self):  # noqa: N802
            self._route("DELETE")

        def log_message(self, *a):  # quiet: Spark logs own the console
            pass

    return Handler


def serve_http(server: "NutchServer", *, port: int = 8081, background: bool = False):
    """Serve the REST API; ``background=True`` returns the live HTTPServer
    (tests), otherwise blocks like the reference's embedded server."""
    from http.server import ThreadingHTTPServer

    httpd = ThreadingHTTPServer(("127.0.0.1", port), make_http_handler(server))
    if background:
        threading.Thread(target=httpd.serve_forever, daemon=True).start()
        return httpd
    try:
        httpd.serve_forever()
    finally:
        httpd.server_close()
    return httpd
