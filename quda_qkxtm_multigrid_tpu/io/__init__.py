from quda_qkxtm_multigrid_tpu.io import lime
try:
    from quda_qkxtm_multigrid_tpu.io import hdf5
except ImportError:          # h5py optional
    hdf5 = None
