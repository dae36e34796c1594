from .basis import basis_break_index, compute_basis, get_basis, basis_block
from .transforms import (
    shr2mat,
    mat2shr,
    shc2mat,
    mat2shc,
    shr2mat_,
    mat2shr_,
    shc2mat_,
    mat2shc_,
    elmr2mat,
    elmc2mat,
)
