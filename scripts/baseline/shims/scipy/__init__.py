# scipy shim package for the BASELINE.md measurement (see ../talib.py docstring)
