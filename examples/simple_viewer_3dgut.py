#!/usr/bin/env python
"""3DGUT viewer entry — file-level parity with the reference's
examples/simple_viewer_3dgut.py (UT projection + world-space eval3d
render). Here the families share one viewer; this pins --model-type 3dgut.
"""

import sys

import simple_viewer


if __name__ == "__main__":
    sys.argv.insert(1, "--model-type")
    sys.argv.insert(2, "3dgut")
    simple_viewer.main()
