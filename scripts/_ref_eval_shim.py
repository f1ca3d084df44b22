"""Python-3 compatibility shim for the UNMODIFIED reference evaluator.

The reference was written for Python 2.7 (reference README.md:48); its file
is executed verbatim via runpy — this wrapper only smooths py2-era library
calls that changed semantics under py3:

* ``np.nanmean(dict.values())`` (voc_eval.py:35) — py2 ``dict.values()``
  was a list; py3's view object is not array-convertible, so nanmean is
  wrapped to coerce non-array iterables first;
* ``gt_dict.keys()[0]`` (eval_tvqa_plus.py:43) — py2 ``keys()`` was
  subscriptable; ``collections.defaultdict`` (the only dict type indexed
  that way there) is swapped for a subclass whose views return lists.

Usage: python _ref_eval_shim.py /path/to/eval_tvqa_plus.py <evaluator args>
"""
import collections
import runpy
import sys

import numpy as np


class _Py2Defaultdict(collections.defaultdict):
    def keys(self):
        return list(super().keys())

    def values(self):
        return list(super().values())

    def items(self):
        return list(super().items())


collections.defaultdict = _Py2Defaultdict

_nanmean = np.nanmean


def nanmean_compat(a, *args, **kwargs):
    if not isinstance(a, (np.ndarray, list, tuple)):
        try:
            a = list(a)
        except TypeError:
            pass
    return _nanmean(a, *args, **kwargs)


np.nanmean = nanmean_compat

target = sys.argv[1]
sys.argv = sys.argv[1:]
runpy.run_path(target, run_name="__main__")
