"""Trigger lifecycle administration: the `minerva trigger ...` surface.

Reference (`/root/reference/src/minerva/commands/trigger.py:14-300`,
`/root/reference/src/minerva/trigger/trigger.py:80-235`): triggers are
created from YAML definitions, listed, enabled/disabled, deleted; their
weight / thresholds / KPI function can be updated in place; and
``create-notifications`` executes a trigger for one timestamp (or all)
appending to its notification store.

Spark mapping: the registry is a YAML-file-per-trigger directory (the
analog of the ``trigger.rule`` catalog tables); definitions are compiled
to executable :class:`Trigger` objects by a caller-supplied factory
(``catalog/initialize.py`` wires instance YAML the same way).  Execution
appends through :class:`NotificationStore` — a distributed write, while
the admin ops are driver-side metadata edits, exactly like the
reference's SQL catalog updates.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field
from datetime import datetime
from typing import Callable

from pyspark.sql import SparkSession

from minerva_etl_spark.store.notification import NotificationStore
from minerva_etl_spark.trigger.trigger import Trigger


def _yaml():
    try:
        import yaml
    except ImportError as exc:  # pragma: no cover
        raise NotImplementedError("pyyaml is required for trigger admin") from exc
    return yaml


@dataclass
class TriggerSet:
    """File-backed trigger registry + admin operations.

    ``factory(config: dict) -> Trigger`` compiles a stored definition to
    an executable trigger (binding the KPI query to part views etc.).
    """

    base_path: str
    factory: Callable[[dict], Trigger]
    _cache: dict[str, Trigger] = field(default_factory=dict)

    @property
    def dir(self) -> str:
        path = os.path.join(self.base_path, "trigger")
        os.makedirs(path, exist_ok=True)
        return path

    def _index(self) -> dict[str, str]:
        """Trigger NAME → file path.  Triggers are identified by their
        declared ``name:`` (reference `trigger.rule.name`), not the
        filename — instance files often use slugged names."""
        out: dict[str, str] = {}
        for f in sorted(os.listdir(self.dir)):
            if not f.endswith(".yaml"):
                continue
            path = os.path.join(self.dir, f)
            try:
                with open(path) as fh:
                    cfg = _yaml().safe_load(fh) or {}
            except Exception:
                continue
            out[cfg.get("name", f[:-5])] = path
        return out

    def _path(self, name: str) -> str:
        return self._index().get(name, os.path.join(self.dir, f"{name}.yaml"))

    # ----------------------------------------------------------- config
    def load_config(self, name: str) -> dict:
        with open(self._path(name)) as f:
            return _yaml().safe_load(f)

    def _save(self, config: dict) -> None:
        with open(self._path(config["name"]), "w") as f:
            _yaml().safe_dump(config, f, sort_keys=False)
        self._cache.pop(config["name"], None)

    # ------------------------------------------------------------ admin
    def create(self, config: dict) -> None:
        """`trigger create` (`commands/trigger.py:42-63`)."""
        if os.path.exists(self._path(config["name"])):
            raise ValueError(f"trigger exists: {config['name']!r}")
        config.setdefault("enabled", True)
        self._save(config)

    def delete(self, name: str) -> None:
        """`trigger delete` (`trigger/trigger.py:128-136` delete_rule)."""
        os.remove(self._path(name))
        self._cache.pop(name, None)

    def names(self) -> list[str]:
        return sorted(self._index())

    def set_enabled(self, name: str, enabled: bool) -> None:
        """`trigger enable|disable` (`trigger/trigger.py:143-151`)."""
        config = self.load_config(name)
        config["enabled"] = enabled
        self._save(config)

    def update_weight(self, name: str, weight: int) -> None:
        """`trigger update-weight` (`commands/trigger.py:139-151`)."""
        config = self.load_config(name)
        config["weight"] = int(weight)
        self._save(config)

    def set_thresholds(self, name: str, thresholds: dict[str, float]) -> None:
        """Threshold update (`trigger/trigger.py:set_thresholds`)."""
        config = self.load_config(name)
        config["thresholds"] = [
            {"name": k, "value": float(v)} for k, v in thresholds.items()
        ]
        self._save(config)

    def update_kpi_function(self, name: str, kpi_query: str) -> None:
        """`trigger update-kpi-function` (`commands/trigger.py:166-180`)."""
        config = self.load_config(name)
        config["kpi_query"] = kpi_query
        self._save(config)

    def update_data_function(self, name: str, data_expr: str) -> None:
        """`trigger update-data-function` (`commands/trigger.py:183-196`):
        replace the expression producing the notification ``data``
        payload."""
        config = self.load_config(name)
        config["data"] = data_expr
        self._save(config)

    def add_tags(self, name: str, tags: list[str]) -> None:
        config = self.load_config(name)
        config["tags"] = sorted(set(config.get("tags", [])) | set(tags))
        self._save(config)

    def list(self) -> list[dict]:
        """`trigger list` rows (`commands/trigger.py:254-271`)."""
        out = []
        for name in self.names():
            c = self.load_config(name)
            out.append(
                {
                    "name": name,
                    "enabled": bool(c.get("enabled", True)),
                    "weight": int(c.get("weight", 1)),
                    "tags": list(c.get("tags", [])),
                    "thresholds": {
                        t["name"]: t["value"] for t in c.get("thresholds", [])
                    },
                }
            )
        return out

    # -------------------------------------------------------- execution
    def get(self, name: str) -> Trigger:
        if name not in self._cache:
            self._cache[name] = self.factory(self.load_config(name))
        return self._cache[name]

    def execute(
        self,
        spark: SparkSession,
        name: str,
        sink: NotificationStore,
        timestamps: list[datetime] | None = None,
    ) -> int:
        """`trigger create-notifications` (`commands/trigger.py:287-300`):
        evaluate for the given timestamps ([] / None = all buckets) and
        append the notifications; returns the notification count."""
        trig = self.get(name)
        if not trig.enabled:
            return 0
        notifications = trig.evaluate(spark, timestamps or [])
        # one pass: count and store without re-evaluating the plan
        notifications = notifications.cache()
        try:
            n = notifications.count()
            if n:
                sink.store(notifications)
        finally:
            notifications.unpersist()
        return n

    def execute_range(
        self,
        spark: SparkSession,
        name: str,
        sink: NotificationStore,
        start: datetime,
        end: datetime,
        granularity,
    ) -> int:
        """Execute over every bucket in (start, end] — the reference's
        per-timestamp loop collapsed into ONE evaluation (the timestamp
        set is an isin filter, so Spark runs a single pruned job instead
        of N tiny ones)."""
        from minerva_etl_spark.catalog.granularity import Granularity

        gran = Granularity.parse(granularity)
        return self.execute(spark, name, sink, gran.range(start, end))
