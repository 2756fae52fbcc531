"""Legacy-toolchain shim: environments with setuptools < 70 and no
``wheel`` package (like this container) cannot build the PEP 660
editable wheel pip prefers when only pyproject.toml exists; with this
shim ``python setup.py develop`` installs the same editable package.
All metadata lives in pyproject.toml."""
from setuptools import setup

setup()
