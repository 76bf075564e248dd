"""JSON-over-TCP control plane (SURVEY §2.10) — the reference's wire
protocol served over the Spark engine.

Reference: ``Backend/engine.py:134-404`` (socket listener + METHOD
dispatch), client ``Backend/api/api.py:9-199`` (one JSON request per
connection; ``get-data`` responses are read until EOF — chunked,
``api.py:177-190``; ``import-dataset`` is two messages on one connection —
the request dict, then the raw file bytes, ``api.py:170-176``).

Protocol parity, method by method:

- ``get-data`` -> ``{"data": <pandas orient='split' JSON string>}`` with
  epoch-float timestamps, or ``{"data": null}`` for an empty frame
  (engine.py:279-316). The frame itself is paged through
  ``EngineAPI.get_data`` (bounded collect) and the response is streamed
  with ``sendall`` — the client's read-until-EOF loop reassembles it.
- ``run-batch`` / ``run-stream`` -> fire-and-forget: the job runs on a
  daemon thread, no response bytes (engine.py:161-255).
- ``get-models`` / ``get-xai-methods`` / ``get-injection-methods`` /
  ``get-datasets`` / ``get-all-jobs`` / ``get-columns`` /
  ``get-dataset-columns`` / ``get-running`` -> the reference's exact
  response envelopes (engine.py:330-404).
- ``import-dataset``: if the target file exists, drain the socket and do
  nothing; else receive the file bytes, stage them, and rewrite with the
  time column renamed ``timestamp`` and moved first
  (engine.py:361-371, execute_calls.py:1029-1044).
- unknown METHOD -> ``{"error": "method-error-response"}``.
"""

from __future__ import annotations

import datetime as _dt
import json
import pathlib
import socket
import tempfile
import threading
import time

import pandas as pd

from exact_spark.plans.api import EngineAPI
from exact_spark.plans.batch import BatchJob

_RECV_CHUNK = 4096


def _strip_job_prefix(name: str) -> str:
    """The reference client pre-prefixes names (api.py:28 sends
    ``job_batch_<name>``); the engine-side catalog prefixes again, so
    normalize to the bare job name."""
    for p in ("job_batch_", "job_stream_"):
        if name.startswith(p):
            return name[len(p):]
    return name


def _parse_settings(inj_params) -> list:
    from exact_spark.operators.inject import AnomalySetting

    out = []
    for p in inj_params or []:
        out.append(
            AnomalySetting(
                anomaly_type=p["anomaly_type"],
                timestamp=float(p.get("timestamp", 0.0)),
                duration=float(p.get("duration", 0.0)),
                magnitude=float(p.get("magnitude", 1.0)),
                percentage=float(p.get("percentage", 100.0)),
                columns=p.get("columns"),
                mean=p.get("mean"),
                data_range=p.get("data_range"),
            )
        )
    return out


class EngineServer:
    """Threaded TCP front-end over :class:`EngineAPI` speaking the
    reference's protocol. ``port=0`` binds an ephemeral port (tests)."""

    def __init__(self, api: EngineAPI, host: str = "127.0.0.1", port: int = 0):
        self.api = api
        self.host = host
        self.port = port
        self._sock: socket.socket | None = None
        self._thread: threading.Thread | None = None
        self._stop = threading.Event()
        self.job_threads: dict[str, threading.Thread] = {}
        # job-name -> "ExcType: msg" for fire-and-forget jobs that failed;
        # surfaced instead of letting a worker thread die unhandled
        self.job_errors: dict[str, str] = {}

    # -- lifecycle -----------------------------------------------------------
    def start(self) -> tuple[str, int]:
        self._sock = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
        self._sock.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
        self._sock.bind((self.host, self.port))
        self._sock.listen()
        self._sock.settimeout(0.2)  # engine.py:140's 1s poll, tightened
        self.port = self._sock.getsockname()[1]
        self._thread = threading.Thread(target=self._serve, daemon=True)
        self._thread.start()
        return self.host, self.port

    def stop(self, drain_s: float = 120.0) -> None:
        # Drain in-flight jobs FIRST: a fire-and-forget run_batch/run_stream
        # thread may still be mid-write (e.g. the end-of-replay compaction),
        # and the caller typically stops the SparkSession right after this —
        # killing the context under a live write job turns a clean shutdown
        # into TASK_WRITE_FAILED noise (the flake this drain removes).
        deadline = time.time() + drain_s
        for t in list(self.job_threads.values()):
            t.join(timeout=max(0.0, deadline - time.time()))
        self._stop.set()
        if self._thread:
            self._thread.join(timeout=5.0)
        if self._sock:
            self._sock.close()

    def _run_job(self, name: str, fn, *args, **kwargs) -> None:
        """Worker-thread entry: record failures on the server instead of
        letting the thread die unhandled. A CANCELLED job fails by design
        (cancel-job drops its table while the job flow still runs — the
        reference's engine likewise lets the worker error out and logs it,
        engine.py:250-255); the error lands in ``job_errors`` where
        get-running/tests can see it."""
        try:
            fn(*args, **kwargs)
        except Exception as exc:  # noqa: BLE001 — boundary: worker thread top
            self.job_errors[name] = f"{type(exc).__name__}: {exc}"[:500]

    def _serve(self) -> None:
        while not self._stop.is_set():
            try:
                conn, _addr = self._sock.accept()
            except socket.timeout:
                continue
            except OSError:
                break
            try:
                raw = conn.recv(_RECV_CHUNK).decode("utf-8")
                self._handle(conn, json.loads(raw))
            except Exception as e:  # engine.py:152-155: log and keep serving
                try:
                    conn.sendall(json.dumps({"error": str(e)}).encode("utf-8"))
                except OSError:
                    pass
            finally:
                try:
                    conn.shutdown(socket.SHUT_RDWR)
                except OSError:
                    pass
                conn.close()

    # -- dispatch (engine.py:158-404) ----------------------------------------
    def _handle(self, conn: socket.socket, data: dict) -> None:
        method = data["METHOD"]
        send = lambda obj: conn.sendall(json.dumps(obj).encode("utf-8"))  # noqa: E731

        if method == "get-data":
            try:
                from_dt = _dt.datetime.fromisoformat(data["from_timestamp"])
                to_dt = (
                    _dt.datetime.fromisoformat(data["to_timestamp"])
                    if data.get("to_timestamp") is not None
                    else None
                )
                name = _strip_job_prefix(data["job_name"])
                stream = data["job_name"].startswith("job_stream_")
                payload = self.api.get_data(
                    name, from_dt, to_dt, stream=stream,
                    limit=data.get("limit"), offset=int(data.get("offset", 0)),
                )
                if payload["data"]:
                    pdf = pd.DataFrame(
                        payload["data"], columns=payload["columns"],
                        index=payload["index"],
                    )
                    # byte-compatible with engine.py:301's
                    # df.to_json(orient="split")
                    send({"data": pdf.to_json(orient="split")})
                else:
                    send({"data": None})  # engine.py:306-308
            except (ValueError, TypeError) as e:  # engine.py:317-321
                send({"error": f"Invalid timestamp format: {e}", "data": None})

        elif method == "run-batch":
            job = BatchJob(
                job_name=_strip_job_prefix(data["name"]),
                filepath=str(
                    (self.api.datasets_dir or pathlib.Path(".")) / data["dataset"]
                ),
                time_col=data.get("time_column") or "timestamp",
                label_col=data.get("label_column"),
                anomaly_settings=_parse_settings(data.get("inj_params")),
                model=data.get("model", "threshold"),
                model_params=data.get("model_params") or {},
            )
            t = threading.Thread(
                target=self._run_job,
                args=(job.job_name, self.api.run_batch, job),
                daemon=True,
            )
            t.start()
            self.job_threads[job.job_name] = t  # fire-and-forget, no response

        elif method == "run-stream":
            from exact_spark.plans.stream import run_stream

            job = BatchJob(
                job_name=_strip_job_prefix(data["name"]),
                filepath=str(
                    (self.api.datasets_dir or pathlib.Path(".")) / data["dataset"]
                ),
                time_col=data.get("time_column") or "timestamp",
                label_col=data.get("label_column"),
                anomaly_settings=_parse_settings(data.get("inj_params")),
                model=data.get("model", "threshold"),
                model_params=data.get("model_params") or {},
            )
            t = threading.Thread(
                target=self._run_job,
                args=(job.job_name, run_stream,
                      self.api.spark, self.api.catalog, job,
                      str(self.api.output_dir / f"stream_{job.job_name}")),
                kwargs={
                    # engine.py:211's speedup knob; chunks is ours (bounds
                    # the micro-batch count of a finite replay)
                    "speedup": float(data.get("speedup", 1000.0)),
                    "chunks": int(data.get("chunks", 20)),
                },
                daemon=True,
            )
            t.start()
            self.job_threads[job.job_name] = t

        elif method == "get-running":
            running = [
                {"name": n, "type": "batch"}
                for n, t in self.job_threads.items()
                if t.is_alive()
            ]
            send({"running": running})
        elif method == "cancel-job":
            self.api.cancel_job(_strip_job_prefix(data["job_name"]))
        elif method == "get-models":
            send({"models": self.api.get_models()})
        elif method == "get-xai-methods":
            send({"methods": self.api.get_xai_methods()})
        elif method == "get-injection-methods":
            send({"injection_methods": self.api.get_injection_methods()})
        elif method == "get-datasets":
            send({"datasets": self.api.get_datasets()})
        elif method == "get-all-jobs":
            send({"jobs": self.api.get_all_jobs()})
        elif method == "get-columns":
            send({"columns": self.api.get_columns(_strip_job_prefix(data["name"]))})
        elif method == "get-dataset-columns":
            send({"columns": self.api.get_dataset_columns(data["dataset"])})

        elif method == "import-dataset":
            dest = self.api.datasets_dir / data["name"]
            conn.settimeout(1)
            body = b""
            try:
                chunk = conn.recv(_RECV_CHUNK)
                while chunk:
                    body += chunk
                    chunk = conn.recv(_RECV_CHUNK)
            except socket.timeout:
                pass
            # file exists -> drain and do nothing (engine.py:366-371)
            if not dest.exists() and body:
                with tempfile.NamedTemporaryFile(
                    "wb", suffix=dest.suffix or ".csv", delete=False
                ) as f:
                    f.write(body)
                    staged = f.name
                try:
                    out = self.api.import_dataset(staged, data["timestamp_column"])
                    pathlib.Path(out).rename(dest) if out != str(dest) else None
                finally:
                    pathlib.Path(staged).unlink(missing_ok=True)

        elif method == "get-queries":
            send({"queries": self.api.get_queries()})
        elif method == "run-query":
            try:
                payload = self.api.run_query(
                    data["name"], sf_dir=data.get("sf_dir"),
                    limit=int(data.get("limit", 1000)),
                )
                send({"columns": payload["columns"],
                      "data": json.loads(json.dumps(payload["data"], default=str))})
            except (KeyError, ValueError) as e:
                send({"error": f"unknown query or bad request: {e}"})
        elif method == "explain-query":
            try:
                send(self.api.explain_query(data["name"], sf_dir=data.get("sf_dir")))
            except (KeyError, ValueError) as e:
                send({"error": f"unknown query or bad request: {e}"})
        elif method == "run-sql":
            try:
                payload = self.api.run_sql(
                    data["sql"], sf_dir=data.get("sf_dir"),
                    limit=int(data.get("limit", 1000)),
                )
                send({"columns": payload["columns"],
                      "data": json.loads(json.dumps(payload["data"], default=str))})
            except (KeyError, ValueError) as e:
                send({"error": f"bad request: {e}"})
            except Exception as e:  # analysis errors (bad SQL) stay JSON
                send({"error": f"sql error: {e}"[:500]})

        else:
            send({"error": "method-error-response"})  # engine.py:402-404
