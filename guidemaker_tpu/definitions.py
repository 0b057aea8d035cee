"""Package paths (mirrors reference definitions.py + __init__.py resources)."""
import os

ROOT_DIR = os.path.dirname(os.path.abspath(__file__))
DATA_DIR = os.path.join(ROOT_DIR, "data")
CONFIG_PATH = os.path.join(DATA_DIR, "config_default.yaml")
WEB_APP = os.path.join(ROOT_DIR, "app.py")
APP_PARAMETER_FILE = os.path.join(DATA_DIR, "parameter_dictionary.md")
APP_PARAMETER_IMG = APP_PARAMETER_FILE  # name kept for reference-API parity
APP_EXPERIMENT_FILE = os.path.join(DATA_DIR, "PooledCRISPRExperiments.md")
