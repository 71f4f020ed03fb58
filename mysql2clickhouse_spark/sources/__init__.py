from .tables import TABLES, load_table, load_all, register_views  # noqa: F401
from .changelog import changelog_from_events, CHANGELOG_VIEW_SQL  # noqa: F401
