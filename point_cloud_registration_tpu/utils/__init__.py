"""Host-side utilities: point-cloud IO, diagnostics/profiling, visualization."""

from point_cloud_registration_tpu.utils.diagnostics import PhaseTimer, profiler_trace
from point_cloud_registration_tpu.utils.io import read_pcd, read_pcd_xyz, write_pcd
