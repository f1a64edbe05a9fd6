"""Trend-store catalog administration: create / add-parts / add-trends /
remove-trends / delete / show / list over the instance directory.

Reference (`/root/reference/src/minerva/commands/trend_store.py`):

- ``create`` (`:59-95`): register a trend store from a definition file;
  duplicate is an error.
- ``add-trends`` (`:98-126,381-404`): sync NEW trends from a definition
  into the live store (columns present in the definition, missing in the
  catalog).
- ``add-parts`` (`:128-139,533-586`): add parts present in the
  definition, missing in the catalog.
- ``remove-trends`` (`:141-168,407-433`): drop catalog trends absent
  from the definition (``remove_extra_trends``).
- ``delete`` (`:589-612`), ``show`` (`:615-694`), ``list`` /
  ``list-config`` (`:697-740`).

The reference's live catalog is the ``trend_directory`` schema; here the
instance YAML directory IS the catalog (initialize compiles it), so
these commands edit the YAML at the dict level — extra keys an operator
added by hand survive round-trips.  Data files align lazily on the next
store/read (columns appear as nulls via mergeSchema; removed columns
stop being selected), mirroring how the reference alters only catalog
tables and lets partition tables follow.
"""

from __future__ import annotations

from pathlib import Path

from minerva_etl_spark.catalog.granularity import Granularity


def _load_yaml(path: Path) -> dict:
    import yaml

    with open(path) as f:
        return yaml.safe_load(f)


def _dump_yaml(path: Path, data: dict) -> None:
    import yaml

    with open(path, "w") as f:
        yaml.safe_dump(data, f, sort_keys=False)


def _store_key(d: dict) -> tuple:
    return (
        d["data_source"],
        d["entity_type"],
        Granularity.parse(str(d["granularity"])).name,
    )


def find_store_file(root: str | Path, key: tuple) -> Path | None:
    """Locate the instance YAML declaring the (data_source, entity_type,
    granularity) triple."""
    for p in sorted((Path(root) / "trend").glob("*.yaml")):
        if _store_key(_load_yaml(p)) == key:
            return p
    return None


def list_trend_stores(root: str | Path) -> list[tuple]:
    """``trend-store list`` / ``list-config``: every declared store as
    (file, data_source, entity_type, granularity)."""
    out = []
    for p in sorted((Path(root) / "trend").glob("*.yaml")):
        d = _load_yaml(p)
        out.append((p.name, *_store_key(d)))
    return out


def create_trend_store(root: str | Path, definition: str | Path) -> Path:
    """``trend-store create``: register a definition file in the
    instance; duplicate (same triple) is an error like the reference's
    ``DuplicateTrendStore``."""
    d = _load_yaml(Path(definition))
    key = _store_key(d)
    from minerva_etl_spark.errors import ExistsError

    existing = find_store_file(root, key)
    if existing is not None:
        raise ExistsError(
            f"trend store {key} already defined in {existing.name}"
        )
    target_dir = Path(root) / "trend"
    target_dir.mkdir(parents=True, exist_ok=True)
    target = target_dir / Path(definition).name
    _dump_yaml(target, d)
    return target


def delete_trend_store(root: str | Path, key: tuple) -> Path:
    """``trend-store delete``: unregister (YAML removal; data files are
    retention's business, like the reference keeps partitions until
    cleanup)."""
    p = find_store_file(root, key)
    if p is None:
        raise FileNotFoundError(f"no trend store {key}")
    p.unlink()
    return p


def add_parts(root: str | Path, definition: str | Path) -> list[str]:
    """``trend-store add-parts``: parts in the definition missing from
    the registered store are appended."""
    d = _load_yaml(Path(definition))
    target = find_store_file(root, _store_key(d))
    if target is None:
        raise FileNotFoundError(f"no trend store {_store_key(d)}")
    current = _load_yaml(target)
    have = {p["name"] for p in current.get("parts", [])}
    added = []
    for part in d.get("parts", []):
        if part["name"] not in have:
            current.setdefault("parts", []).append(part)
            added.append(part["name"])
    if added:
        _dump_yaml(target, current)
    return added


def add_trends(root: str | Path, definition: str | Path) -> list[str]:
    """``trend-store add-trends``: per matching part, trends in the
    definition missing from the registered store are appended.  Returns
    ``part.trend`` names added."""
    d = _load_yaml(Path(definition))
    target = find_store_file(root, _store_key(d))
    if target is None:
        raise FileNotFoundError(f"no trend store {_store_key(d)}")
    current = _load_yaml(target)
    parts_by_name = {p["name"]: p for p in current.get("parts", [])}
    added = []
    for part in d.get("parts", []):
        cur = parts_by_name.get(part["name"])
        if cur is None:
            continue  # add-parts is the command for new parts
        have = {t["name"] for t in cur.get("trends", [])}
        for trend in part.get("trends", []):
            if trend["name"] not in have:
                cur.setdefault("trends", []).append(trend)
                added.append(f"{part['name']}.{trend['name']}")
    if added:
        _dump_yaml(target, current)
    return added


def remove_trends(root: str | Path, definition: str | Path) -> list[str]:
    """``trend-store remove-trends`` (= reference
    ``remove_extra_trends``): registered trends ABSENT from the
    definition are dropped, per matching part."""
    d = _load_yaml(Path(definition))
    target = find_store_file(root, _store_key(d))
    if target is None:
        raise FileNotFoundError(f"no trend store {_store_key(d)}")
    current = _load_yaml(target)
    keep_by_part = {
        p["name"]: {t["name"] for t in p.get("trends", [])}
        for p in d.get("parts", [])
    }
    removed = []
    for part in current.get("parts", []):
        if part["name"] not in keep_by_part:
            continue
        keep = keep_by_part[part["name"]]
        kept, dropped = [], []
        for trend in part.get("trends", []):
            (kept if trend["name"] in keep else dropped).append(trend)
        part["trends"] = kept
        removed.extend(f"{part['name']}.{t['name']}" for t in dropped)
    if removed:
        _dump_yaml(target, current)
    return removed


def change_trend_store(
    root: str | Path, definition: str | Path, force: bool = False
) -> list[tuple[str, tuple[list[str], list[str], list[str]]]]:
    """``trend-store change``: one-shot sync of a definition onto the
    registered store (reference `commands/trend_store.py:210-256` —
    the composite of add-parts + add-trends + remove-trends +
    alter-trends).  Per part, returns ``(part, (added, removed,
    changed))`` where ``changed`` lists trends whose data type or
    aggregation metadata moved to the definition's value.

    Type NARROWING is refused unless ``force`` (the reference's
    ``--force`` contract): without it, a definition declaring a less
    powerful type than the registered one leaves the column untouched
    and reports nothing — widening is always applied.  Data files align
    lazily on the next store, exactly like the other catalog-only
    ALTERs.
    """
    from minerva_etl_spark.catalog import datatypes as dt

    d = _load_yaml(Path(definition))
    target = find_store_file(root, _store_key(d))
    if target is None:
        raise FileNotFoundError(f"no trend store {_store_key(d)}")
    current = _load_yaml(target)
    parts_by_name = {p["name"]: p for p in current.get("parts", [])}
    results: list[tuple[str, tuple[list, list, list]]] = []
    for part in d.get("parts", []):
        name = part["name"]
        cur = parts_by_name.get(name)
        if cur is None:
            current.setdefault("parts", []).append(part)
            results.append(
                (name, ([t["name"] for t in part.get("trends", [])], [], []))
            )
            continue
        want = {t["name"]: t for t in part.get("trends", [])}
        have = {t["name"]: t for t in cur.get("trends", [])}
        added = [n for n in want if n not in have]
        removed = [n for n in have if n not in want]
        changed: list[str] = []
        for n, spec in want.items():
            if n not in have:
                continue
            old = have[n]
            delta = False
            # the catalog's default for an omitted data_type is numeric
            # (instance.py trend default; check_config agrees) — NOT
            # text, whose top-of-ladder rank would turn every omitted
            # type into a silent widen-to-text
            old_type = old.get("data_type", "numeric")
            new_type = spec.get("data_type", "numeric")
            if old_type != new_type:
                try:
                    old_t = dt.REGISTRY[str(old_type).lower()]
                    new_t = dt.REGISTRY[str(new_type).lower()]
                except KeyError as exc:
                    raise ValueError(
                        f"unknown data type {exc.args[0]!r} for trend "
                        f"{part['name']}.{n}"
                    ) from None
                if force or new_t.rank >= old_t.rank:
                    old["data_type"] = new_type
                    delta = True
            for k in ("time_aggregation", "entity_aggregation"):
                if k in spec and spec[k] != old.get(k):
                    old[k] = spec[k]
                    delta = True
            if delta:
                changed.append(n)
        cur["trends"] = [have[n] for n in have if n not in removed] + [
            want[n] for n in added
        ]
        results.append((name, (added, removed, changed)))
    if any(a or r or c for _, (a, r, c) in results):
        _dump_yaml(target, current)
    return results


def check_config(
    root: str | Path, definition: str | Path | None = None
) -> dict[str, list[str]]:
    """``trend-store check-config``
    (`commands/trend_store/check_config.py:23-67`): validate trend-store
    definitions.  The reference checks duplicate part names; we also
    flag duplicate trend names within a part, unknown data types, and
    unparsable granularity/partition_size — the config errors that
    otherwise surface as job failures mid-load.  Returns
    {file: [errors]} (empty lists = Ok)."""
    from minerva_etl_spark.catalog import datatypes as dt

    files = (
        [Path(definition)]
        if definition is not None
        else sorted((Path(root) / "trend").glob("*.yaml"))
    )
    report: dict[str, list[str]] = {}
    for p in files:
        errors: list[str] = []
        d = _load_yaml(p)
        parts = d.get("parts", [])
        names = [part["name"] for part in parts]
        for name in sorted({n for n in names if names.count(n) > 1}):
            errors.append(
                f"There are {names.count(name)} parts named '{name}', "
                "but part names must be unique"
            )
        for part in parts:
            tnames = [t["name"] for t in part.get("trends", [])]
            for name in sorted({n for n in tnames if tnames.count(n) > 1}):
                errors.append(
                    f"part '{part['name']}' declares trend '{name}' "
                    f"{tnames.count(name)} times"
                )
            for t in part.get("trends", []):
                if t.get("data_type", "numeric").lower() not in dt.REGISTRY:
                    errors.append(
                        f"part '{part['name']}' trend '{t['name']}': "
                        f"unknown data type {t.get('data_type')!r}"
                    )
        for field_name in ("granularity", "partition_size"):
            value = d.get(field_name)
            if value is not None:
                try:
                    Granularity.parse(str(value))
                except Exception:
                    errors.append(f"unparsable {field_name}: {value!r}")
        report[p.name] = errors
    return report


def show_trend_store(root: str | Path, key: tuple) -> str:
    """``trend-store show``: human-readable dump mirroring the
    reference's field list (`trend_store.py:627-694`)."""
    p = find_store_file(root, key)
    if p is None:
        raise FileNotFoundError(f"no trend store {key}")
    d = _load_yaml(p)
    lines = [
        "Trend Store",
        "",
        f"file:             {p.name}",
        f"entity_type:      {d['entity_type']}",
        f"data_source:      {d['data_source']}",
        f"granularity:      {d['granularity']}",
        f"partition_size:   {d.get('partition_size')}",
        f"retention_period: {d.get('retention_period')}",
        "parts:",
    ]
    for part in d.get("parts", []):
        header = part["name"]
        lines.append(f"                  {header}")
        lines.append(f"                  {'=' * len(header)}")
        for t in part.get("trends", []):
            lines.append(
                f"                  {t['name']}: "
                f"{t.get('data_type', 'numeric')}"
            )
    return "\n".join(lines)
