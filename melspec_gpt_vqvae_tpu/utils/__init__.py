from .codes import (  # noqa: F401
    make_idx,
    grid_to_sequence,
    sequence_to_grid,
    code_reader,
)
