from tdgs.viewer.server import RenderTabState, ViewerServer

__all__ = ["RenderTabState", "ViewerServer"]
