"""NetCDF output + restart, mirroring the reference's layout.

qg-node writes (time, [level,] y, x) records of vertex fields on (N+1)^2
nodes (/root/reference/qg-node/netcdf_vertex_bas.h:53-172), newqg the
cell-centered (N, N) variant (/root/reference/newqg/netcdf_bas.h); restart
reads a named variable at the last stored time
(netcdf_vertex_bas.h:315-424, `ncks -d time,-1,-1 vars.nc restart.nc`).

Implemented over scipy.io.netcdf_file (NetCDF-3 classic — the same format
the reference's nc_create produces), float32 on disk like the reference.
"""

from __future__ import annotations

import numpy as np
from scipy.io import netcdf_file


class NCWriter:
    """Append-mode record writer: create_nc + write_nc equivalents."""

    def __init__(self, path, var_names, n, nl=None, L0=1.0, x0=0.0, y0=0.0,
                 vertex=False, surface_vars=()):
        """`surface_vars`: names written without the level dimension even
        when nl is set (e.g. the SQG surface buoyancy bs, a 2-D prognostic
        sharing vars.nc with the layered fields, qg-node/qg.h:492-495)."""
        self.path = path
        self.names = list(var_names)
        self.nl = nl
        self.vertex = vertex
        self.surface = set(surface_vars)
        npts = n + 1 if vertex else n
        f = netcdf_file(path, "w")
        f.createDimension("time", None)
        if nl is not None:
            f.createDimension("level", nl)
            f.createVariable("level", "i4", ("level",))[:] = np.arange(nl)
        f.createDimension("y", npts)
        f.createDimension("x", npts)
        delta = L0 / n
        coords = (np.arange(npts) * delta if vertex
                  else (np.arange(npts) + 0.5) * delta)
        f.createVariable("x", "f4", ("x",))[:] = coords + x0
        f.createVariable("y", "f4", ("y",))[:] = coords + y0
        f.createVariable("time", "f4", ("time",))
        dims = ("time", "level", "y", "x") if nl is not None else \
            ("time", "y", "x")
        for name in self.names:
            d = ("time", "y", "x") if name in self.surface else dims
            f.createVariable(name, "f4", d)
        self._f = f
        self._nt = 0

    def append(self, t, **fields):
        f = self._f
        it = self._nt
        f.variables["time"][it] = t
        for name in self.names:
            f.variables[name][it] = np.asarray(fields[name], np.float32)
        self._nt += 1
        f.sync()

    def close(self):
        self._f.close()


def read_nc(path, names, time_index=-1):
    """Read variables at one time record (default: last — the reference's
    restart convention; time_index=None reads every record). Returns dict
    name -> array, plus the record time (array of times for None)."""
    with netcdf_file(path, "r", mmap=False) as f:
        out = {}
        for name in names:
            v = f.variables[name]
            out[name] = np.array(v[:] if time_index is None
                                 else v[time_index], np.float64)
        tv = f.variables["time"]
        t = (np.array(tv[:], np.float64) if time_index is None
             else float(np.array(tv[time_index])))
    return out, t
