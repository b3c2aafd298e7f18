"""Command-line twins of the reference binaries.

  python -m jm_tpu.tools.lencod -d encoder.cfg [-f more.cfg] [-p Name=Value]
  python -m jm_tpu.tools.ldecod -d decoder.cfg | -i in.264 -o out.yuv [-r ref]

Parity targets: lencod/src/lencod.c main loop + report (image.c ReportI/P),
ldecod/src/ldecod.c + image.c find_snr.
"""
