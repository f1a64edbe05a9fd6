"""Granularity: the period of a trend store.

Semantics follow the reference implementation
(`/root/reference/src/minerva/storage/trend/granularity.py:13-152`):

- a granularity is either a plain number of seconds (15m/30m/1h/1d/1w as
  900/1800/3600/86400/604800) or a calendar month count;
- timestamps **label the end of a period**, and a period covers the
  half-open interval ``(end - granularity, end]`` — i.e. a timestamp
  exactly on a boundary belongs to the period it terminates
  (`aggregation_compilation.py:726-737`);
- ``truncate`` floors a timestamp to the period start, ``bucket_end``
  maps a timestamp to the end-label of its covering period;
- ``range(start, end)`` yields the period-end labels in ``(start, end]``.

All storage arithmetic is done in UTC (the engine pins
``spark.sql.session.timeZone=UTC``); second-based granularities are pure
epoch arithmetic, month granularities use calendar logic.

The class also emits the matching Spark SQL *and* ANSI/DuckDB SQL
expression text for bucket-end labeling, so generated aggregation queries
and their oracles agree bit-for-bit.
"""

from __future__ import annotations

import re
from dataclasses import dataclass
from datetime import datetime, timedelta

_SECONDS = {
    "s": 1,
    "sec": 1,
    "second": 1,
    "seconds": 1,
    "m": 60,
    "min": 60,
    "minute": 60,
    "minutes": 60,
    "h": 3600,
    "hr": 3600,
    "hour": 3600,
    "hours": 3600,
    "d": 86400,
    "day": 86400,
    "days": 86400,
    "w": 604800,
    "week": 604800,
    "weeks": 604800,
}

_MONTHS = {"month", "months", "mon"}

_GRANULARITY_RE = re.compile(r"^\s*(\d+)\s*([a-zA-Z]*)\s*$")


@dataclass(frozen=True)
class Granularity:
    """Either ``seconds > 0`` (and months == 0) or ``months > 0``."""

    seconds: int = 0
    months: int = 0

    # ------------------------------------------------------------- parse
    @classmethod
    def parse(cls, spec: "str | int | Granularity") -> "Granularity":
        """Parse '900', '15m', '1h', '1d', '1w', '1month', 900."""
        if isinstance(spec, Granularity):
            return spec
        if isinstance(spec, int):
            return cls(seconds=spec)
        match = _GRANULARITY_RE.match(str(spec))
        if not match:
            raise ValueError(f"unparsable granularity: {spec!r}")
        num = int(match.group(1))
        unit = match.group(2).lower()
        if not unit:
            return cls(seconds=num)
        if unit in _MONTHS:
            return cls(months=num)
        if unit in ("y", "yr", "year", "years"):
            return cls(months=12 * num)
        if unit in _SECONDS:
            return cls(seconds=num * _SECONDS[unit])
        raise ValueError(f"unknown granularity unit: {unit!r}")

    def __post_init__(self) -> None:
        if (self.seconds > 0) == (self.months > 0):
            raise ValueError("granularity needs exactly one of seconds/months > 0")

    # ------------------------------------------------------------ render
    @property
    def name(self) -> str:
        if self.months:
            return f"{self.months}month" if self.months != 12 else "1year"
        for label, sec in (("w", 604800), ("d", 86400), ("h", 3600), ("m", 60)):
            if self.seconds % sec == 0 and self.seconds >= sec:
                return f"{self.seconds // sec}{label}"
        return f"{self.seconds}s"

    def __str__(self) -> str:  # pragma: no cover
        return self.name

    @property
    def _epoch_offset(self) -> int:
        """Alignment offset for epoch flooring.  Weeks are Monday-based
        (reference/PostgreSQL date_trunc('week'); epoch day 0 was a
        Thursday, so the Monday grid is shifted by -3 days)."""
        if self.seconds and self.seconds % 604800 == 0:
            return -259200  # 1969-12-29 (a Monday)
        return 0

    # ------------------------------------------- python-side arithmetic
    def truncate(self, ts: datetime) -> datetime:
        """Floor ``ts`` to the start of its period (UTC wall clock)."""
        if self.months:
            total = (ts.year * 12 + (ts.month - 1)) // self.months * self.months
            return ts.replace(
                year=total // 12, month=total % 12 + 1, day=1,
                hour=0, minute=0, second=0, microsecond=0,
            )
        epoch = ts.timestamp() if ts.tzinfo else (ts - datetime(1970, 1, 1)).total_seconds()
        off = self._epoch_offset
        floored = int((epoch - off) // self.seconds) * self.seconds + off
        return ts + timedelta(seconds=floored - epoch)

    def inc(self, ts: datetime) -> datetime:
        if self.months:
            total = ts.year * 12 + (ts.month - 1) + self.months
            return ts.replace(year=total // 12, month=total % 12 + 1)
        return ts + timedelta(seconds=self.seconds)

    def decr(self, ts: datetime) -> datetime:
        if self.months:
            total = ts.year * 12 + (ts.month - 1) - self.months
            return ts.replace(year=total // 12, month=total % 12 + 1)
        return ts - timedelta(seconds=self.seconds)

    def before(self, ts: datetime) -> datetime:
        """``ts`` minus this period as DELAY arithmetic: like
        :meth:`decr`, months are calendar months, but the day-of-month
        clamps to the target month's length (May 31 − 1month =
        Apr 30) — PostgreSQL ``timestamp - interval`` semantics, since
        delay anchors (``now``) land on arbitrary days while bucket
        labels (decr's domain) are always month starts."""
        if self.months:
            import calendar

            total = ts.year * 12 + (ts.month - 1) - self.months
            y, m = total // 12, total % 12 + 1
            return ts.replace(
                year=y, month=m, day=min(ts.day, calendar.monthrange(y, m)[1])
            )
        return ts - timedelta(seconds=self.seconds)

    def bucket_end(self, ts: datetime) -> datetime:
        """End-label of the period covering ``ts`` ((start, end] semantics)."""
        start = self.truncate(ts)
        return start if ts == start else self.inc(start)

    def range(self, start: datetime, end: datetime) -> list[datetime]:
        """Period-end labels in ``(start, end]`` (reference granularity.range)."""
        out: list[datetime] = []
        cur = self.inc(self.truncate(start)) if start != self.truncate(start) else start
        if cur == start:
            cur = self.inc(cur)
        while cur <= end:
            out.append(cur)
            cur = self.inc(cur)
        return out

    def source_buckets(
        self, target_end: datetime, source: "Granularity"
    ) -> list[datetime]:
        """X4 timestamp mapping ``trend.mapping_<src>-><dst>``: the
        source-granularity bucket end-labels covered by the target
        period ending at ``target_end`` (reference
        `aggregation_generation.py:268-270`, `materialization.py:40-60`).
        The identity case (same granularity) returns [target_end]."""
        if source == self:
            return [target_end]
        return source.range(self.decr(target_end), target_end)

    # ----------------------------------------------------- SQL emission
    def bucket_end_spark_sql(self, ts_col: str) -> str:
        """Spark SQL expression: bucket end-label of ``ts_col``.

        Integer epoch-microsecond ceil-division — order-independent and
        exactly reproducible, so it hashes identically to the DuckDB
        oracle expression from :meth:`bucket_end_ansi_sql`.
        """
        if self.months:
            if self.months == 1:
                trunc = f"date_trunc('month', {ts_col})"
            else:
                # N-month grid (3month/6month/1year...): floor the
                # month index (year*12 + month-1) to the grid, rebuild
                # the period-start timestamp (reference supports any
                # relativedelta period, `granularity.py:97-152`)
                trunc = self._month_grid_start_spark_sql(ts_col)
            return (
                f"CASE WHEN {ts_col} = {trunc} THEN {ts_col} "
                f"ELSE {trunc} + INTERVAL {self.months} MONTH END"
            )
        period_us = self.seconds * 1_000_000
        off_us = self._epoch_offset * 1_000_000
        # NTZ-safe under a UTC session: cast NTZ -> instant -> epoch micros,
        # ceil-divide on the (Monday-aligned, for weeks) grid, come back
        # as NTZ (naive/UTC — DuckDB-comparable)
        return (
            f"cast(timestamp_micros((((unix_micros(cast({ts_col} as timestamp))"
            f" - {off_us} + {period_us - 1}) div {period_us}) * {period_us}"
            f" + {off_us})) as timestamp_ntz)"
        )

    def _month_grid_start_spark_sql(self, ts_col: str) -> str:
        n = self.months
        mi = f"(year({ts_col}) * 12 + month({ts_col}) - 1)"
        gs = f"(({mi} div {n}) * {n})"
        return (
            f"make_timestamp_ntz({gs} div 12, {gs} % 12 + 1, 1, 0, 0, 0)"
        )

    def _month_grid_start_ansi_sql(self, ts_col: str) -> str:
        n = self.months
        mi = f"(year({ts_col}) * 12 + month({ts_col}) - 1)"
        gs = f"(({mi} // {n}) * {n})"
        return f"make_timestamp({gs} // 12, {gs} % 12 + 1, 1, 0, 0, 0)"

    def bucket_end_ansi_sql(self, ts_col: str) -> str:
        """DuckDB-compatible oracle expression matching bucket_end_spark_sql."""
        if self.months:
            if self.months == 1:
                trunc = f"date_trunc('month', {ts_col})"
            else:
                trunc = self._month_grid_start_ansi_sql(ts_col)
            return (
                f"CASE WHEN {ts_col} = {trunc} THEN {ts_col} "
                f"ELSE {trunc} + INTERVAL {self.months} MONTH END"
            )
        period_us = self.seconds * 1_000_000
        off_us = self._epoch_offset * 1_000_000
        return (
            f"make_timestamp((((epoch_us({ts_col}) - {off_us} + {period_us - 1}) "
            f"// {period_us}) * {period_us}) + {off_us})"
        )

    def bucket_end_local_spark_sql(self, ts_col: str, tz: str) -> str:
        """DST-aware bucket end for calendar granularities (1d/1month):
        the reference truncates in *local wall clock*
        (`granularity.py:48-76`, `helpers.py:77-137`), so a day bucket
        is 23/25 h long across DST transitions.  Input/output are naive
        UTC; the tz database does the wall↔instant mapping."""
        unit = "month" if self.months else "day"
        if not self.months and self.seconds != 86400:
            raise ValueError("local-time buckets support 1d/1month only")
        local = f"from_utc_timestamp(cast({ts_col} as timestamp), '{tz}')"
        trunc = f"date_trunc('{unit}', {local})"
        step = "INTERVAL 1 MONTH" if self.months else "INTERVAL 1 DAY"
        end_wall = (
            f"CASE WHEN {local} = {trunc} THEN {local} "
            f"ELSE {trunc} + {step} END"
        )
        return f"cast(to_utc_timestamp({end_wall}, '{tz}') as timestamp_ntz)"

    def bucket_end_local_ansi_sql(self, ts_col: str, tz: str) -> str:
        """DuckDB twin of :meth:`bucket_end_local_spark_sql`
        (session-timezone-independent composition of timezone())."""
        unit = "month" if self.months else "day"
        if not self.months and self.seconds != 86400:
            raise ValueError("local-time buckets support 1d/1month only")
        local = f"timezone('{tz}', timezone('UTC', {ts_col}))"
        trunc = f"CAST(date_trunc('{unit}', {local}) AS TIMESTAMP)"
        step = "INTERVAL 1 MONTH" if self.months else "INTERVAL 1 DAY"
        end_wall = (
            f"CASE WHEN {local} = {trunc} THEN {local} "
            f"ELSE {trunc} + {step} END"
        )
        return f"timezone('UTC', timezone('{tz}', {end_wall}))"

    def bucket_start_spark_sql(self, ts_col: str) -> str:
        """Spark SQL expression: period-start (floor) of ``ts_col``."""
        if self.months:
            if self.months == 1:
                return f"date_trunc('month', {ts_col})"
            return self._month_grid_start_spark_sql(ts_col)
        period_us = self.seconds * 1_000_000
        off_us = self._epoch_offset * 1_000_000
        return (
            f"cast(timestamp_micros(((unix_micros(cast({ts_col} as timestamp))"
            f" - {off_us}) div {period_us}) * {period_us} + {off_us})"
            f" as timestamp_ntz)"
        )

    def partition_index_spark_sql(self, ts_col: str, partition_size: "Granularity") -> str:
        """Partition index = which ``partition_size`` bucket the timestamp
        falls in (reference ``timestamp_to_index``,
        `trendstore.py:266-283`) — used as the storage partition column."""
        if partition_size.months:
            return f"(year({ts_col}) * 12 + month({ts_col}) - 1) div {partition_size.months}"
        return f"unix_seconds(cast({ts_col} as timestamp)) div {partition_size.seconds}"

    @staticmethod
    def partition_index_py(ts, partition_size: "Granularity") -> int:
        """Python twin of :meth:`partition_index_spark_sql` for a
        UTC-session engine (r17): lets a caller who already holds the
        batch's timestamps driver-side derive touched partitions with
        NO Spark job.  Matches the SQL exactly — ``div`` truncates
        toward zero (unlike Python ``//``, which floors), and the
        seconds path interprets the naive timestamp as UTC, which is
        what ``cast(ntz as timestamp)`` does under the engine's pinned
        UTC session timezone (callers must gate on that — see
        ``TrendStore.store``)."""
        from datetime import timezone as _tz

        if partition_size.months:
            # always non-negative for CE years: // == div
            return (ts.year * 12 + ts.month - 1) // partition_size.months
        epoch = int(ts.replace(tzinfo=_tz.utc).timestamp())
        q, s = divmod(epoch, partition_size.seconds)
        # Spark's integral div truncates toward zero; Python floors
        if q < 0 and s != 0:
            q += 1
        return q


#: default partition size per granularity, from the reference compiler
#: (`aggregation_compilation.py:416-423`)
DEFAULT_PARTITION_SIZE: dict[str, str] = {
    "15m": "1d",
    "30m": "2d",
    "1h": "4d",
    "1d": "3month",
    "1w": "1year",
    "1month": "5year",
    "3month": "5year",
    "6month": "10year",
    "1year": "10year",
}
