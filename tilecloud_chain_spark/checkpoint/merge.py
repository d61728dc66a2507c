"""Iceberg-shaped MERGE/DELETE table over the parquet stand-in.

SURVEY/BASELINE mandate Iceberg semantics for the job/queue/status store
(MERGE claims, snapshot expiry). This environment ships no Iceberg runtime
jars, so the table format is a parquet snapshot chain with an atomically-
renamed current-pointer — but the MUTATION API is exactly Iceberg's row-level
ops, and every call also records the equivalent ``MERGE INTO`` / ``DELETE
FROM`` SQL in the snapshot log, so moving to a real Iceberg catalog is
``spark.sql(entry["sql"])`` per call site and nothing else.

Shape notes for 100 TB: the tables managed here (job/stage status) are
tiny control-plane state — mutations are driver-side pyarrow, never a Spark
job. The data plane (queue rows, stage outputs) stays in Spark-written
parquet (CheckpointStore); on Iceberg both use the same MERGE statements
this module logs.

Snapshot model (Iceberg analog):
- ``snap-<n>.parquet`` immutable snapshot files
- ``current.json`` pointer, replaced atomically (the "commit")
- ``log.jsonl`` append-only snapshot log (timestamp, op, sql, row stats)
- ``expire_snapshots(keep_last)`` drops old snapshot files, keeping the
  log — Iceberg's ``expireSnapshots`` maintenance action.
"""

from __future__ import annotations

import contextlib
import json
import os
import time
import uuid

import pandas as pd


def iceberg_available(spark) -> bool:
    """True when the Iceberg Spark runtime classes are on the session's
    classpath (no jars ship in this sandbox, so this is False here; on a
    cluster with ``--packages org.apache.iceberg:iceberg-spark-runtime...``
    it flips True and MergeTable executes its logged SQL for real)."""
    try:
        spark._jvm.java.lang.Class.forName(  # noqa: SLF001
            "org.apache.iceberg.spark.SparkCatalog"
        )
        return True
    except Exception:
        return False


class MergeTable:
    """Concurrency: every row-level mutation (``merge``/``delete_where``) is
    a read-modify-write over the single ``current.json`` pointer, so two
    concurrent writers (a resumed run plus a maintenance requeue) would each
    rewrite the full snapshot and the last writer silently drop the other's
    transition. Mutations therefore take an ``O_EXCL`` lock file around the
    read->commit critical section (Iceberg's optimistic-commit analog for a
    filesystem pointer); a writer that dies mid-commit leaves a lock that is
    broken after ``lock_timeout`` seconds.

    Iceberg swap: pass ``spark`` + ``iceberg_table`` (fully-qualified
    catalog name). When the Iceberg runtime is on the classpath
    (:func:`iceberg_available`), every mutation EXECUTES the very SQL
    statement it logs — built once by :meth:`_merge_sql` /
    :meth:`_delete_sql`, so the parquet stand-in and the real path cannot
    drift (statement-parity is pytest-asserted) — and ``read`` comes from
    ``spark.table``. Without the jars (this sandbox) the parquet snapshot
    chain runs the identical statements' semantics locally."""

    def __init__(
        self,
        root: str,
        columns: list[str],
        lock_timeout: float = 30.0,
        spark=None,
        iceberg_table: str | None = None,
    ) -> None:
        self.root = root
        self.columns = list(columns)
        self.lock_timeout = float(lock_timeout)
        self.spark = spark
        self.iceberg_table = iceberg_table
        self.use_iceberg = bool(
            spark is not None and iceberg_table and iceberg_available(spark)
        )
        os.makedirs(root, exist_ok=True)

    def _table_name(self) -> str:
        return self.iceberg_table or os.path.basename(self.root)

    # -- SQL builders: the single source of truth for BOTH paths -------------

    def _qualify(self, condition: str) -> str:
        """Conditions come as pandas ``query`` expressions over the TARGET
        row (e.g. ``status == 'pending'``). For the executed SQL every bare
        column reference must be qualified as ``t.<col>`` — unqualified, a
        column present in both target and source raises AMBIGUOUS_REFERENCE
        (and would not mean the documented target-row semantics anyway)."""
        import re

        cols = sorted(self.columns, key=len, reverse=True)
        pattern = r"\b(" + "|".join(re.escape(c) for c in cols) + r")\b"
        # split out string literals so column names inside them stay verbatim
        parts = re.split(r"('(?:[^'\\]|\\.)*'|\"(?:[^\"\\]|\\.)*\")", condition)
        return "".join(
            part if k % 2 else re.sub(pattern, r"t.\1", part)
            for k, part in enumerate(parts)
        )

    def _merge_sql(
        self, on: list[str], update: bool, insert: bool,
        matched_condition: str | None,
    ) -> str:
        cond_sql = (
            f" AND ({self._qualify(matched_condition)})" if matched_condition else ""
        )
        return (
            f"MERGE INTO {self._table_name()} t USING source s ON "
            + " AND ".join(f"t.{c} = s.{c}" for c in on)
            + (f" WHEN MATCHED{cond_sql} THEN UPDATE SET *" if update else "")
            + (" WHEN NOT MATCHED THEN INSERT *" if insert else "")
        )

    def _delete_sql(self, condition: str) -> str:
        return f"DELETE FROM {self._table_name()} WHERE {condition}"

    def _exec_iceberg(self, sql: str, source: list[dict] | None = None) -> None:
        """Run the logged statement for real: the source rows become the
        ``source`` temp view the MERGE references. Source rows are padded to
        the FULL column set (None for absent columns) so ``UPDATE SET *`` /
        ``INSERT *`` resolve — and None-padding reproduces the parquet
        path's semantics exactly (its matched-row replacement is
        ``{**{c: None for c in columns}, **src_row}``)."""
        if source is not None:
            padded = pd.DataFrame(source).reindex(columns=self.columns)
            self.spark.createDataFrame(padded).createOrReplaceTempView("source")
        self.spark.sql(sql)

    def _log_only(self, op: str, sql: str, stats: dict) -> None:
        """Iceberg path bookkeeping: the catalog owns snapshots; only the
        statement log is kept locally (same file the parquet path writes).
        The sequence number continues from the last logged entry (the local
        pointer never advances on this path)."""
        entries = self.snapshots()  # robust to an existing-but-empty log
        n = (entries[-1]["n"] + 1) if entries else 1
        with open(os.path.join(self.root, "log.jsonl"), "a") as f:
            f.write(json.dumps({
                "n": n, "at": time.time(), "op": op, "sql": sql, **stats,
            }) + "\n")

    # heartbeats never slower than this, regardless of lock_timeout — so a
    # breaker's staleness bound (3x the holder's declared cadence) is small
    # even when the holder was configured with a very long timeout
    _HB_CAP = 1.0

    def _holder_stale_after(self, lock: str) -> float:
        """Seconds without an mtime refresh before the lock at ``lock`` is
        presumed abandoned. Judged against the HOLDER's declared heartbeat
        cadence (written into the lock file), not this breaker's own
        ``lock_timeout``: two MergeTable instances on the same root may be
        configured with different timeouts, and a breaker whose timeout is
        shorter than the holder's heartbeat gap would otherwise stale-break
        a LIVE holder (two concurrent writers, lost updates).

        Unreadable / legacy / not-yet-written lock content declares NO
        cadence, so the holder could be a pre-upgrade writer heartbeating
        at ITS ``lock_timeout / 3`` (uncapped — e.g. 10 s gaps for a 30 s
        timeout) — presuming the 1 s cadence cap there would let a
        short-timeout breaker stale-break that live legacy holder. The
        fallback is therefore this breaker's OWN ``lock_timeout`` as the
        presumed cadence (stale only after 3x it). Mixed-version writers
        whose heartbeat gap exceeds 3x the breaker's timeout (legacy
        ``lock_timeout`` > 9x the breaker's) remain unsupported on one
        root — upgrade all writers together in that configuration."""
        try:
            with open(lock) as f:
                hb = float(json.loads(f.read())["hb"])
        except Exception:
            hb = self.lock_timeout  # no declared cadence: presume slow
        return max(self.lock_timeout, 3.0 * hb)

    @contextlib.contextmanager
    def _locked(self):
        """A lock with no heartbeat for :meth:`_holder_stale_after` seconds
        is presumed abandoned and broken. While HELD, a daemon thread touches
        the lock file's mtime every ``min(lock_timeout / 3, 1s)`` seconds, so
        a LIVE holder is never broken no matter how long its mutation runs
        (the Iceberg path holds the lock across a Spark MERGE job that can
        exceed any static timeout) — staleness measures holder death, not
        mutation length. The cadence is written INTO the lock file so
        breakers with a different ``lock_timeout`` judge staleness against
        the holder's actual cadence, never their own shorter timeout.

        Breaking is compare-and-unlink — the stale identity (inode, mtime)
        is re-confirmed after a settle delay so a racing breaker that
        already re-acquired (fresh inode/mtime) is never unlinked, and a
        heartbeat landing during the settle window changes mtime and vetoes
        the break; the residual stat->unlink window is microseconds against
        a timeout measured in seconds. The release unlink re-checks
        ownership via a uuid token in the lock content (inode numbers are
        recycled on unlink+create, so inode identity is NOT ownership): a
        holder that WAS stale-broken while running must not delete the
        usurper's fresh lock. Like the break path, release is
        read-then-unlink, so a RESIDUAL window remains: between reading our
        own token back and the unlink syscall, a breaker could stale-break
        and re-acquire, and this release would then delete the usurper's
        fresh lock. Reaching it requires a breaker to observe >=
        ``lock_timeout`` seconds of missed heartbeats plus its settle delay
        precisely between two adjacent syscalls of a live releasing holder
        — microseconds against seconds, the same accepted odds as the break
        path's stat->unlink window (an atomic rename-aside release would
        instead open a window where the usurper's live lock is missing and
        a THIRD writer acquires — strictly worse)."""
        import threading

        lock = os.path.join(self.root, ".lock")
        hb_period = min(self.lock_timeout / 3.0, self._HB_CAP)
        deadline = time.time() + self.lock_timeout
        while True:
            try:
                fd = os.open(lock, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
                break
            except FileExistsError:
                try:
                    st = os.stat(lock)
                except FileNotFoundError:
                    continue  # raced the holder's release; retry immediately
                age = time.time() - st.st_mtime
                # stat-first fast path: _holder_stale_after is >= our own
                # lock_timeout (max() floor), so a younger lock can never be
                # stale — skip the per-poll open+json parse entirely
                if age > self.lock_timeout and age > self._holder_stale_after(lock):
                    time.sleep(0.05)  # settle: a live re-acquirer shows up here
                    try:
                        st2 = os.stat(lock)
                    except FileNotFoundError:
                        continue
                    if (st2.st_ino, st2.st_mtime) == (st.st_ino, st.st_mtime):
                        with contextlib.suppress(FileNotFoundError):
                            os.unlink(lock)
                    continue
                if time.time() > deadline:
                    raise TimeoutError(
                        f"MergeTable commit lock busy for >{self.lock_timeout}s: {lock}"
                    )
                time.sleep(0.02)
        my_token = uuid.uuid4().hex
        stop = threading.Event()

        def _heartbeat() -> None:
            while not stop.wait(hb_period):
                with contextlib.suppress(FileNotFoundError):
                    os.utime(lock)

        hb = threading.Thread(target=_heartbeat, daemon=True)
        try:
            # heartbeat starts FIRST: if the content write below raises, the
            # finally must still join a STARTED thread (joining an
            # unstarted one raises RuntimeError, masking the real error
            # and skipping the unlink — a leaked lock)
            hb.start()
            os.write(fd, json.dumps({
                "pid": os.getpid(), "hb": hb_period, "token": my_token,
            }).encode())
            os.close(fd)
            yield
        finally:
            stop.set()
            if hb.ident is not None:  # only join a thread that started
                hb.join(timeout=1.0)
            with contextlib.suppress(Exception):  # unknown content (e.g. a
                # legacy bare-pid lock parses as a non-dict) must mean "not
                # mine", never an exception escaping the finally block
                with open(lock) as f:
                    content = json.loads(f.read())
                owner = content.get("token") if isinstance(content, dict) else None
                if owner == my_token:  # never unlink a usurper's lock
                    os.unlink(lock)

    # -- snapshot plumbing --------------------------------------------------

    def _pointer(self) -> dict:
        p = os.path.join(self.root, "current.json")
        if not os.path.exists(p):
            return {"snapshot": None, "n": 0}
        with open(p) as f:
            return json.load(f)

    def _commit(self, df: pd.DataFrame, op: str, sql: str, stats: dict) -> None:
        cur = self._pointer()
        n = cur["n"] + 1
        snap = f"snap-{n:06d}.parquet"
        df.reset_index(drop=True).to_parquet(os.path.join(self.root, snap))
        with open(os.path.join(self.root, "log.jsonl"), "a") as f:
            f.write(json.dumps({
                "n": n, "at": time.time(), "op": op, "sql": sql, **stats
            }) + "\n")
        tmp = os.path.join(self.root, f"current.json.tmp-{uuid.uuid4().hex}")
        with open(tmp, "w") as f:
            json.dump({"snapshot": snap, "n": n}, f)
        os.replace(tmp, os.path.join(self.root, "current.json"))

    def read(self) -> pd.DataFrame:
        if self.use_iceberg:
            return self.spark.table(self._table_name()).toPandas()
        cur = self._pointer()
        if cur["snapshot"] is None:
            return pd.DataFrame({c: pd.Series(dtype=object) for c in self.columns})
        return pd.read_parquet(os.path.join(self.root, cur["snapshot"]))

    # -- Iceberg row-level ops ------------------------------------------------

    def merge(
        self,
        source: list[dict],
        on: list[str],
        update: bool = True,
        insert: bool = True,
        matched_condition: str | None = None,
    ) -> dict:
        """``MERGE INTO target USING source ON <keys> [WHEN MATCHED [AND
        <condition>] THEN UPDATE SET *] [WHEN NOT MATCHED THEN INSERT *]``.

        ``matched_condition`` is a pandas ``query`` expression over the
        TARGET row (Iceberg's ``WHEN MATCHED AND t.<cond>``).

        Returns ``{"updated": int|None, "inserted": int|None}`` on BOTH
        paths — the Iceberg path fills the counts from the new snapshot's
        summary when the catalog exposes it, else leaves them None (never a
        missing key, so callers reading ``stats["updated"]`` behave the
        same with and without the runtime jars)."""
        if self.use_iceberg:
            sql = self._merge_sql(on, update, insert, matched_condition)
            with self._locked():
                self._exec_iceberg(sql, source)
                stats = self._iceberg_merge_stats()
                self._log_only("merge", sql, stats)
            return stats

        with self._locked():
            return self._merge_locked(source, on, update, insert, matched_condition)

    def _iceberg_merge_stats(self) -> dict:
        """Row stats for the just-committed MERGE from the table's snapshot
        summary (``<table>.snapshots`` metadata table). Iceberg reports
        updates as replaced rows: under copy-on-write MERGE,
        ``updated-records`` is absent and ``added-records`` counts EVERY row
        in the rewritten files (updates plus carried-over unchanged rows) —
        reporting it as "inserted" would inflate the count precisely in that
        mode. So: inserted is only derivable when ``updated-records`` IS
        present (merge-on-read) — and even there, MoR writes each updated
        row's new version as an added data record, so inserts =
        added-records MINUS updated-records; both stay None otherwise
        rather than report a known-wrong number."""
        try:
            row = self.spark.sql(
                f"SELECT summary FROM {self._table_name()}.snapshots "
                "ORDER BY committed_at DESC LIMIT 1"
            ).collect()[0]
            summary = dict(row["summary"])
            upd = summary.get("updated-records")
            ins = summary.get("added-records")
            return {
                "updated": int(upd) if upd is not None else None,
                "inserted": (
                    max(0, int(ins) - int(upd))
                    if upd is not None and ins is not None
                    else None
                ),
            }
        except Exception:
            return {"updated": None, "inserted": None}

    def _merge_locked(self, source, on, update, insert, matched_condition) -> dict:
        src = pd.DataFrame(source)
        tgt = self.read()
        key = lambda df: list(zip(*(df[c] for c in on)))  # noqa: E731
        tgt_keys = set(key(tgt)) if len(tgt) else set()
        src_keyed = {k: row for k, row in zip(key(src), source)}
        updated = inserted = 0
        rows = tgt.to_dict("records")
        if update and len(tgt):
            cond_idx = set(tgt.query(matched_condition).index) if matched_condition else None
            for i, row in enumerate(rows):
                k = tuple(row[c] for c in on)
                if k in src_keyed and (cond_idx is None or i in cond_idx):
                    rows[i] = {**{c: None for c in self.columns}, **src_keyed[k]}
                    updated += 1
        if insert:
            for k, row in src_keyed.items():
                if k not in tgt_keys:
                    rows.append({**{c: None for c in self.columns}, **row})
                    inserted += 1
        out = pd.DataFrame(rows, columns=self.columns)
        sql = self._merge_sql(on, update, insert, matched_condition)
        stats = {"updated": updated, "inserted": inserted}
        self._commit(out, "merge", sql, stats)
        return stats

    def delete_where(self, condition: str) -> list[dict]:
        """``DELETE FROM target WHERE <condition>`` — returns deleted rows."""
        if self.use_iceberg:
            sql = self._delete_sql(condition)
            with self._locked():
                victims = self.spark.sql(
                    f"SELECT * FROM {self._table_name()} WHERE {condition}"
                ).toPandas().to_dict("records")
                self._exec_iceberg(sql)
                self._log_only("delete", sql, {"deleted": len(victims)})
            return victims
        with self._locked():
            return self._delete_locked(condition)

    def _delete_locked(self, condition: str) -> list[dict]:
        tgt = self.read()
        if not len(tgt):
            return []
        hit = tgt.query(condition)
        out = tgt.drop(hit.index)
        self._commit(
            out, "delete", self._delete_sql(condition), {"deleted": int(len(hit))}
        )
        return hit.to_dict("records")

    # -- maintenance ----------------------------------------------------------

    def snapshots(self) -> list[dict]:
        p = os.path.join(self.root, "log.jsonl")
        if not os.path.exists(p):
            return []
        with open(p) as f:
            return [json.loads(line) for line in f if line.strip()]

    def expire_snapshots(self, keep_last: int = 3) -> int:
        """Drop snapshot data files older than the last ``keep_last``
        (Iceberg expireSnapshots); the log and the current pointer stay."""
        cur = self._pointer()
        removed = 0
        for name in os.listdir(self.root):
            if not name.startswith("snap-"):
                continue
            n = int(name.split("-")[1].split(".")[0])
            if n <= cur["n"] - keep_last:
                os.remove(os.path.join(self.root, name))
                removed += 1
        return removed
