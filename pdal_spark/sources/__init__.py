from pdal_spark.sources.faux import faux_reader
from pdal_spark.sources.las import read_las, write_las
from pdal_spark.sources.pages import read_pages, synth_pages
from pdal_spark.sources.text import read_text
from pdal_spark.sources.tindex import read_tindex

__all__ = ["faux_reader", "read_las", "read_pages", "synth_pages",
           "read_text", "read_tindex", "write_las"]
