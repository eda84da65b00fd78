from .pages import gen_pages, expected_component_of  # noqa: F401
from .mtx import read_mtx  # noqa: F401
from .tables import TableLayer  # noqa: F401
