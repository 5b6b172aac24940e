"""Pure-stdlib binary format readers (xlsx, Avro OCF) used by parser
directives — this container ships no POI/openpyxl/avro, and the formats
are publicly specified, so small readers keep the directives real."""
