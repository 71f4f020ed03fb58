from .filters import (  # noqa: F401
    filter_tables,
    filter_schemas,
    filter_dml,
    filter_time_range,
    filter_pos_range,
    split_old_deletes,
    with_txn_start,
)
from .apply import (  # noqa: F401
    apply_append,
    apply_insert_as_update,
    apply_mutate,
    latest_by_key,
    merge_upsert,
    delete_full_row_antijoin,
    null_safe_cond,
)
from .project import normalize_values  # noqa: F401
from .dedup import duplicate_audit, dedup_in_window  # noqa: F401
from .retention import (  # noqa: F401
    retention_probe,
    retention_count,
    purge_eligible_files,
    ledger_prune,
)
