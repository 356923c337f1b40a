from .pages import build_pages, pages_cte_sql  # noqa: F401
from .zones import ZONE_LAYER, zone_layer_df  # noqa: F401
