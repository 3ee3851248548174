// Test-only shim: forwards to the single string-algorithms header.
#include "../string.hpp"
