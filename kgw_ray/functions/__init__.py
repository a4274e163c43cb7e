from kgw_ray.functions.scalars import clean, is_informative_value, json_dumps, json_loads  # noqa: F401
