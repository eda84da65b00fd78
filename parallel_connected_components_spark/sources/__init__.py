from .pages import gen_pages, expected_component_of  # noqa: F401
from .mtx import read_mtx, write_mtx  # noqa: F401
from .grids import gen_grid_edges, grid_diameter  # noqa: F401
from .tables import TableLayer  # noqa: F401
from .suitesparse import fetch_matrix, load_matrix, suitesparse_url  # noqa: F401
from .bucketed import (  # noqa: F401
    load_bucketed_edges,
    pin_bucketed_edges,
    save_bucketed_edges,
)
