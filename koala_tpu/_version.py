"""Version of the koala-tpu framework.

The reference engine reports "3.0.0" (measured from libpv_koala.so via
pv_koala_version; see SURVEY.md). We version independently but keep the
same major to signal contract compatibility with the v3 streaming API.
"""

__version__ = "3.0.0-tpu.1"
