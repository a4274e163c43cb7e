from kgw_ray.sources.readers import read_table  # noqa: F401
from kgw_ray.sources.pages import synth_pages, pages_dataset, render_html, url_for  # noqa: F401
