"""robot.py with reversed wheel spin (reference robot_reversed.py)."""
import os

os.environ["ROBOT_REVERSED"] = "1"

with open(os.path.join(os.path.dirname(__file__), "robot.py")) as f:
    code = f.read()
exec(compile(code.replace('if __name__ == "__main__":', "if True:"), "robot.py", "exec"))
