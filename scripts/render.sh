#!/bin/bash
# Render eval h5 dumps with mitsuba (see render_mitsuba.py)
path_h5="path/to/clouds.h5"
path_png="path/to/figures/"
path_mitsuba="path/to/mitsuba2/build/dist/"
name_png="4f"
python render_mitsuba.py --path_h5 $path_h5 --path_png $path_png --path_mitsuba $path_mitsuba --name_png $name_png --indices 1 10 22
