"""Back-compat shim: the serving implementation moved into the package.

See ``immunostruct_tpu/serving.py`` (also ``python -m
immunostruct_tpu.cli.serve``) for the filesystem-queue and HTTP
transports, the request format, and the usage examples.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from immunostruct_tpu.serving import (  # noqa: E402,F401 (re-exports)
    main, make_http_server, request_to_args, serve_one, write_example,
)

if __name__ == "__main__":
    main()
