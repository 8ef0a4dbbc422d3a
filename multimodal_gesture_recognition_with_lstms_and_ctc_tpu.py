"""Alias module: the full project name re-exports the ``mgr_tpu``
package (``import multimodal_gesture_recognition_with_lstms_and_ctc_tpu``
is unwieldy in code, so the framework lives under the short name)."""

import sys

import mgr_tpu

sys.modules[__name__] = mgr_tpu
