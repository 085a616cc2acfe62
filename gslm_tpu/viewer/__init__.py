"""Interactive viewer bridge (SIBR remote-viewer wire protocol)."""

from gslm_tpu.viewer.network_gui import ViewerServer

__all__ = ["ViewerServer"]
