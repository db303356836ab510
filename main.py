"""End-to-end demo CLI — tiny test training followed by inference from the
resulting training directory (reference main.py:1-11; uses sys.executable
instead of the reference's hard-coded Windows venv path, a documented fix).
"""
import subprocess
import sys
from datetime import datetime

timestamp = datetime.now().strftime("%Y%m%d_%H%M%S")

# Run training on small test Imagen
subprocess.check_call([sys.executable, "train.py", "-test", "-ts", timestamp])

# Use small test Imagen to generate an image
subprocess.check_call([sys.executable, "inference.py", "-d", f"training_{timestamp}"])
