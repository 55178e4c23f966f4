from .coreset import pool_by_similarity, unpool_by_similarity  # noqa: F401
from .layout import tile_sequence, untile_sequence  # noqa: F401
