"""Offline tooling: artifact precompute + compiled-executable export.

Parity with the reference's L8 tooling (SURVEY.md §2): the Python
preprocessing scripts (`scripts/python/solov2_det2d_kitti.py`,
`fcos3d_det3d_kitti.py`, `leastereo_kitti.py`, `raft_flow_kitti.py`)
map to `tools/precompute.py`, and the TensorRT engine builders
(`system/build_tools/build_{solo,raft}.cpp`) map to
`tools/build_engines.py` (jax.export StableHLO artifacts + persistent
XLA compile-cache warming).
"""
