from .pip import Polygon, points_in_polygon, points_in_rings, pip_sql_expr  # noqa: F401
