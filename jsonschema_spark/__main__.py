"""`python -m jsonschema_spark` — see cli.py.

Reference: /root/reference/jsonschema/__main__.py:1-6.
"""
import sys

from .cli import main

sys.exit(main())
