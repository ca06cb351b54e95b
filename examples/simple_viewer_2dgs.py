#!/usr/bin/env python
"""2DGS viewer entry — file-level parity with the reference's
examples/simple_viewer_2dgs.py (a copy of simple_viewer.py pinned to the
surfel render path). Here the families share one viewer; this pins
--model-type 2dgs.
"""

import sys

import simple_viewer


if __name__ == "__main__":
    sys.argv.insert(1, "--model-type")
    sys.argv.insert(2, "2dgs")
    simple_viewer.main()
