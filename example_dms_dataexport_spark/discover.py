"""fill_dms_metadata analogue (ref :431-481): discover tables in a stage.

The reference runs 5 REGEXP_SUBSTR group extractions over each file path
``<provider>://<bucket>/<db_prefix>/<db_schema>/<db_table>/<file>``
(ref :442-447) and inserts one metadata row per distinct parsed table.
POSIX ``[[:alnum:]]`` (ref :443) becomes Java/Python ``[0-9A-Za-z]``
(SURVEY §7.5 trap 7).  Plain local paths (no ``scheme://``) are also
supported: the last two path components before the file are schema/table.
"""

from __future__ import annotations

import re

from pyspark.sql import SparkSession

from .listing import list_stage
from .metadata import MetadataStore, TableMeta

# ref :443-447 — lazy (.*?) quantifiers behave identically in Python/Java.
_URI_RX = re.compile(r"([0-9A-Za-z]*)://(.*?)/(.*)/(.*?)/(.*?)/.*")
# ref :442 — full_path is everything up to the last '/'.
_FULL_PATH_RX = re.compile(r"((.*))/")


def parse_stage_path(path: str, stage_root: str | None = None):
    """Parse one file path into the reference's 6 metadata fields.

    Returns dict(full_path, cloud_provider, bucket, db_prefix, db_schema,
    db_table) or None when the path has fewer components than the DMS
    layout requires.
    """
    m = _FULL_PATH_RX.match(path)
    full_path = m.group(1) if m else None
    um = _URI_RX.match(path)
    if um:
        provider, bucket, db_prefix, db_schema, db_table = um.groups()
    else:
        # local / schemeless fallback: .../<db_schema>/<db_table>/<file>
        parts = path.split("/")
        if len(parts) < 3:
            return None
        provider, bucket, db_prefix = "", "", "/".join(parts[:-3])
        db_schema, db_table = parts[-3], parts[-2]
    if full_path is None or not db_schema or not db_table:
        return None
    if stage_root is not None:
        # store full_path relative to the stage so the planner's
        # prefix-equality join (ref :140) is stage-location independent
        from .listing import relativize

        full_path = relativize(full_path, stage_root)
    return {
        "full_path": full_path,
        "cloud_provider": provider,
        "bucket": bucket,
        "db_prefix": db_prefix,
        "db_schema": db_schema,
        "db_table": db_table,
    }


def fill_dms_metadata(
    spark: SparkSession,
    store: MetadataStore,
    stage: str,
    primary_keys: dict[str, list[str]] | None = None,
    additional_config: dict[str, str] | None = None,
) -> int:
    """LIST the stage, parse distinct table prefixes, register metadata rows
    (ref :454-473).  ``primary_keys`` maps ``db_table`` → PK column list —
    the reference leaves primary_keys to be filled manually (ref :27);
    here the caller can supply them at discovery time.
    ``additional_config`` maps ``db_table`` → the variant-column JSON
    string (ref :34), e.g. a declared target layout
    (``TableMeta.layout()``), so discovery registers read-optimized
    tables in one step.

    Returns the number of rows registered (ref :474 returns recordsInserted).
    """
    files = list_stage(spark, stage)
    seen: dict[str, dict] = {}
    for f in files:
        parsed = parse_stage_path(f.path, stage_root=stage)
        if parsed:
            seen.setdefault(parsed["full_path"], parsed)
    for full_path, p in sorted(seen.items()):
        store.register(
            TableMeta(
                full_path=full_path,
                db_schema=p["db_schema"],
                db_table=p["db_table"],
                stage=stage,
                primary_keys=(primary_keys or {}).get(p["db_table"], []),
                additional_config=(additional_config or {}).get(
                    p["db_table"], "{}"
                ),
                cloud_provider=p["cloud_provider"],
                bucket=p["bucket"],
                db_prefix=p["db_prefix"],
            ),
            overwrite=False,
        )
    return len(seen)
