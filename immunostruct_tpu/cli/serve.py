"""CLI entry for batch serving (``python -m immunostruct_tpu.cli.serve``).

Thin wrapper over ``immunostruct_tpu.serving`` — see that module for the
transports (filesystem queue, HTTP endpoint) and the request format. The
reference has no serving entry point; its nearest analog rebuilds the
whole torch stack per run (/root/reference/infer_IEDB_or_Cancer.py).
"""

from immunostruct_tpu.serving import main

if __name__ == "__main__":
    main()
