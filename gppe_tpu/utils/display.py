"""Display/notebook detection (reference:
gaussian_proc/_utilities/display_utilities.py:14-29)."""


def is_notebook():
    try:
        shell = get_ipython().__class__.__name__  # noqa: F821
        if shell == "ZMQInteractiveShell":
            return True
        return False
    except NameError:
        return False


def has_display():
    """True when a graphical backend can be used (reference
    plot_utilities.py:32-47: DISPLAY / GPPE_NO_DISPLAY gating)."""
    import os
    if os.environ.get("GPPE_NO_DISPLAY", "") or \
            os.environ.get("IMATE_NO_DISPLAY", ""):
        return False
    if is_notebook():
        return True
    return bool(os.environ.get("DISPLAY", ""))
