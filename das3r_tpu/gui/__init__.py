"""Interactive viewer — the TPU-native counterpart of the reference's
dearpygui GUI (train_gui.py:57-465) and vestigial socket viewer
(gaussian_renderer/network_gui.py).

The reference GUI renders orbit views, staticness maps, dynamic-mask
blends and trajectory plots into a desktop window; this machine (and most
TPU hosts) is headless, so the equivalent here is an in-process panel
renderer (`viewer.ViewerScene`) plus a zero-dependency HTTP server
(`server`) that streams the same panels to a browser with drag-to-orbit
controls."""
from das3r_tpu.gui.viewer import ViewerScene  # noqa: F401
