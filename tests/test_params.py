import numpy as np

from ertdx.params import (PARAM_DIM, ParameterLimits, ParameterNames,
                          ParameterSpace)


def test_dims_and_bounds():
    sp = ParameterSpace()
    assert sp.dim == PARAM_DIM == 29
    assert sp.plims.shape == (29, 2)
    assert (sp.plims[:, 1] > sp.plims[:, 0]).all()
    # spot values from the reference (Generate_ERT_utils.py:16-59)
    assert sp.plims[0].tolist() == [0.05, 0.35]
    assert sp.plims[1].tolist() == [2e-13, 1e-7]
    assert sp.plims[18].tolist() == [2e-5, 9e-3]
    assert sp.plims[24].tolist() == [1e-5, 1e-2]
    assert sp.plims[28].tolist() == [0.005, 0.1]


def test_logparms():
    sp = ParameterSpace()
    assert sp.logparms == (1, 7, 13, 18, 21, 24, 25, 26, 27, 28)
    assert sp.log_mask.sum() == 10


def test_names():
    sp = ParameterSpace()
    assert len(sp.names) == 29
    assert sp.names[0] == "Hanford Fm porosity"
    assert sp.names[-1] == "Flush water conductivity [$S/m$]"


def test_compat_shims():
    pl = ParameterLimits()
    pn = ParameterNames()
    sp = ParameterSpace()
    np.testing.assert_array_equal(pl.plims, sp.plims)
    assert pl.logparms == list(sp.logparms)
    assert pn.names == list(sp.names)


def test_contains():
    sp = ParameterSpace()
    mid = sp.plims.mean(axis=1)
    assert sp.contains(mid[None, :]).all()
    bad = mid.copy()
    bad[0] = 10.0
    assert not sp.contains(bad[None, :]).any()
